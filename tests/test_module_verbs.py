"""Module-level aligner/cluster verbs over an existing result DB
(reference: foldseek's structurealign/tmalign/lolalign/
structurerescorediagonal/clust/rbh/multimersearch commands)."""
import os

import pytest


@pytest.fixture(scope="module")
def small_setup(example_dir, tmp_path_factory):
    from foldseek_tpu.cli import main
    d = tmp_path_factory.mktemp("modverbs")
    db = str(d / "db")
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    aln0 = str(d / "aln0")
    assert main(["search", db, db, aln0, str(d / "t0"),
                 "--exhaustive-search", "1", "-v", "1"]) == 0
    return db, aln0, d


@pytest.mark.parametrize("verb", ["structurealign", "tmalign", "lolalign",
                                  "structurerescorediagonal"])
def test_module_aligners(small_setup, verb):
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db
    db, aln0, d = small_setup
    out = str(d / f"out_{verb}")
    assert main([verb, db, db, aln0, out, "-v", "1"]) == 0
    results, _ = read_result_db(out)
    assert len(results) == 4
    # self hits must rank first for every aligner
    for qkey, rs in results.items():
        assert rs[0].db_key == qkey


def test_clust_verb(small_setup):
    from foldseek_tpu.cli import main
    db, aln0, d = small_setup
    out = str(d / "clu.tsv")
    assert main(["clust", db, aln0, out, "-v", "1"]) == 0
    lines = [l.split("\t") for l in open(out)]
    assert len(lines) == 4  # every entry appears once as member


def test_rbh_verb(small_setup):
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db
    db, aln0, d = small_setup
    out = str(d / "rbhdb")
    assert main(["rbh", db, db, out, str(d / "t2"),
                 "--exhaustive-search", "1", "-v", "1"]) == 0
    results, _ = read_result_db(out)
    assert all(rs[0].db_key == qkey for qkey, rs in results.items())


def test_multimersearch_verb(example_dir, tmp_path):
    from foldseek_tpu.cli import main
    db = str(tmp_path / "db")
    assert main(["createdb", str(example_dir / "1tim.pdb.gz"),
                 str(example_dir / "8tim.pdb.gz"), db, "-v", "1"]) == 0
    out = str(tmp_path / "cpx")
    assert main(["multimersearch", db, db, out, str(tmp_path / "t"),
                 "-v", "1"]) == 0
    body = open(out).read()
    assert body.startswith("#foldseek-tpu complexres") and "\t" in body
