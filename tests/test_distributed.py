"""Multi-host simulation: 2 processes x 4 CPU devices each run the
distributed prefilter over per-host panel shards; the merged global top-k
must equal the single-process result (the reference's MPI split-and-merge,
Prefiltering.cpp:589-700, replaced by jax.distributed + all_gather)."""
import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).parent / "distributed_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_prefilter_matches_single(example_dir, tmp_path):
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.ungapped import UngappedPrefilter

    files = [str(f) for f in sorted(example_dir.iterdir())
             if "tim" not in f.name]
    db = create_db(files, str(tmp_path / "db"))

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(pathlib.Path(__file__).parents[1])]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"out_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(port), "2", str(pid),
             str(tmp_path / "db"), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr.decode()[-2000:]

    single = UngappedPrefilter(db)
    seqs = [np.asarray(db.get_ss(i)) for i in range(min(db.size, 8))]
    expected = [[ [k, s] for k, s in hits]
                for hits in single.query_batch(seqs, SearchParams())]
    for out in outs:
        got = json.load(open(out))
        assert got == expected


def test_two_process_e2e_search_matches_single(example_dir, tmp_path):
    """Full distributed search (sharded prefilter + query-sharded align +
    allgather merge) across 2 processes x 4 CPU devices equals the
    single-process pipeline's records."""
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import search
    from foldseek_tpu.search.results import result_to_line

    files = [str(f) for f in sorted(example_dir.iterdir())
             if "tim" not in f.name][:10]
    db = create_db(files, str(tmp_path / "db"))

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(pathlib.Path(__file__).parents[1])]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"se_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(port), "2", str(pid),
             str(tmp_path / "db"), str(out), "search"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr.decode()[-2000:]

    res = search(db, db, SearchParams(add_backtrace=True, prefilter_mode=1,
                                      max_seqs=16))
    expected = [f"{qk}\t{result_to_line(r, True)}"
                for qk in sorted(res) for r in res[qk]]
    for out in outs:
        got = json.load(open(out))
        assert got == expected
