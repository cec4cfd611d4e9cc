"""Reciprocal best hit golden parity (split SCOP domains A vs B)."""
import shutil

import pytest


def test_easy_rbh_golden(example_dir, golden_dir, tmp_path):
    a_dir = tmp_path / "a"
    b_dir = tmp_path / "b"
    a_dir.mkdir()
    b_dir.mkdir()
    domains = sorted(f for f in example_dir.iterdir() if "tim" not in f.name)
    for i, f in enumerate(domains):
        shutil.copy(f, (b_dir if i % 2 == 0 else a_dir) / f.name)

    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.rbh import easy_rbh
    lines = easy_rbh(str(a_dir), str(b_dir), str(tmp_path / "rbh.m8"),
                     str(tmp_path / "tmp"), SearchParams())
    golden = [l.rstrip("\n") for l in open(golden_dir / "rbh.m8")]
    assert lines == golden
