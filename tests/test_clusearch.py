"""Cluster-search (--cluster-search 1) parity: search representatives,
expand hits through cluster members, re-align against the _seq DB.

Goldens from the reference binary: scop_refclu.tsv is `foldseek cluster`'s
assignment on the SCOP examples; clusearch.m8 is
`search --cluster-search 1` + convertalis with d1asha_ as query."""
import os

import pytest


def test_cluster_search_golden(example_dir, golden_dir, scop_dir, tmp_path):
    from foldseek_tpu.cli import main
    scopdb = str(tmp_path / "scopdb")
    assert main(["createdb", str(scop_dir), scopdb, "-v", "1"]) == 0
    cludb = str(tmp_path / "cludb")
    assert main(["createclusearchdb", scopdb,
                 str(golden_dir / "scop_refclu.tsv"), cludb, "-v", "1"]) == 0
    qdb = str(tmp_path / "qdb")
    assert main(["createdb", str(example_dir / "d1asha_"), qdb, "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", qdb, cludb, aln, str(tmp_path / "tmp"),
                 "--cluster-search", "1", "-v", "1"]) == 0
    out = str(tmp_path / "cs.m8")
    assert main(["convertalis", qdb, cludb, aln, out, "-v", "1"]) == 0
    assert open(out).read() == (golden_dir / "clusearch.m8").read_text()


@pytest.fixture(scope="module")
def scop_dir(example_dir, tmp_path_factory):
    import shutil
    d = tmp_path_factory.mktemp("scop_cs")
    for f in example_dir.iterdir():
        if "tim" not in f.name:
            shutil.copy(f, d / f.name)
    return d
