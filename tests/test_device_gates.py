"""Device survivor-gating path (FOLDSEEK_TPU_DEVICE_GATES=1): the fused
TM+LDDT fleet (ops/gates_device) must reproduce the host gates to f32
accuracy through the full search pipeline, in both the resident-CA-panel
and union-upload modes."""
import os
import shutil

import numpy as np
import pytest

from foldseek_tpu.ingest.createdb import create_db
from foldseek_tpu.search.params import SearchParams
from foldseek_tpu.search.pipeline import search


@pytest.fixture(scope="module")
def scop_db(example_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("dgdb")
    files = sorted(str(f) for f in example_dir.iterdir()
                   if "tim" not in f.name)[:12]
    return create_db(files, str(d / "db"))


def _run(db, env):
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return search(db, db, SearchParams(add_backtrace=True))
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _compare(host, dev):
    assert set(host) == set(dev)
    n = 0
    for qk in host:
        hs = {r.db_key: r for r in host[qk]}
        ds = {r.db_key: r for r in dev[qk]}
        assert set(hs) == set(ds)
        for tk, h in hs.items():
            d = ds[tk]
            assert abs(h.tm - d.tm) < 2e-3, (qk, tk, h.tm, d.tm)
            assert abs(h.lddt - d.lddt) < 2e-3, (qk, tk, h.lddt, d.lddt)
            assert abs(h.score - d.score) <= 1, (qk, tk, h.score, d.score)
            n += 1
    assert n > 50


def test_device_gates_match_host(scop_db):
    host = _run(scop_db, {"FOLDSEEK_TPU_DEVICE_GATES": "0"})
    dev = _run(scop_db, {"FOLDSEEK_TPU_DEVICE_GATES": "1"})
    _compare(host, dev)


def test_device_gates_union_panel(scop_db, monkeypatch):
    """DB larger than the HBM budget: the per-fleet union upload path."""
    from foldseek_tpu.ops import gates_device
    monkeypatch.setattr(gates_device, "resident_ca_panel", lambda db: None)
    host = _run(scop_db, {"FOLDSEEK_TPU_DEVICE_GATES": "0"})
    dev = _run(scop_db, {"FOLDSEEK_TPU_DEVICE_GATES": "1"})
    _compare(host, dev)
