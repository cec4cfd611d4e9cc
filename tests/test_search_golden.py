"""End-to-end easy-search parity vs reference golden m8 outputs."""
import shutil

import pytest

from foldseek_tpu.search.params import SearchParams
from foldseek_tpu.search.pipeline import easy_search


@pytest.fixture(scope="module")
def scop_dir(example_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("scop")
    for f in example_dir.iterdir():
        if "tim" not in f.name:
            shutil.copy(f, d / f.name)
    return d


def _diff_lines(mine, golden_path):
    golden = [l.rstrip("\n") for l in open(golden_path)]
    exact = sum(1 for a, b in zip(mine, golden) if a == b)
    return exact, len(golden)


def test_easy_search_tim_exact(example_dir, golden_dir, tmp_path):
    params = SearchParams(exhaustive_search=True)
    lines = easy_search(str(example_dir / "1tim.pdb.gz"),
                        str(example_dir / "8tim.pdb.gz"),
                        str(tmp_path / "tim.m8"), str(tmp_path / "tmp"), params)
    golden = [l.rstrip("\n") for l in open(golden_dir / "tim.m8")]
    assert lines == golden


def test_easy_search_scop_ava_default_kmer(scop_dir, golden_dir, tmp_path):
    """Default mode: k-mer prefilter -> structurealign -> convertalis."""
    params = SearchParams()
    lines = easy_search(str(scop_dir), str(scop_dir),
                        str(tmp_path / "scop.m8"), str(tmp_path / "tmp"), params)
    golden = [l.rstrip("\n") for l in open(golden_dir / "scop_ava.m8")]
    assert len(lines) == len(golden)
    mismatches = [(a, b) for a, b in zip(sorted(lines), sorted(golden)) if a != b]
    assert len(mismatches) <= 2, mismatches[:5]
    for a, b in mismatches:
        fa, fb = a.split("\t"), b.split("\t")
        assert fa[:10] == fb[:10]
        assert abs(int(fa[11]) - int(fb[11])) <= 1


def test_easy_search_scop_ava_exhaustive(scop_dir, golden_dir, tmp_path):
    params = SearchParams(exhaustive_search=True)
    lines = easy_search(str(scop_dir), str(scop_dir),
                        str(tmp_path / "scop.m8"), str(tmp_path / "tmp"), params)
    golden = [l.rstrip("\n") for l in open(golden_dir / "scop_ava_exh.m8")]
    assert len(lines) == len(golden)
    mismatches = [(a, b) for a, b in zip(sorted(lines), sorted(golden)) if a != b]
    # Known drift: the structure-bit score int(score*sqrt(lddt*tm)) can differ
    # by +-1 on float32-vs-float64 TM/LDDT rounding for a handful of pairs.
    assert len(mismatches) <= 2, mismatches[:5]
    for a, b in mismatches:
        fa, fb = a.split("\t"), b.split("\t")
        assert fa[:10] == fb[:10], (a, b)  # everything but evalue/bits equal
        assert abs(int(fa[11]) - int(fb[11])) <= 1


def test_easy_search_alt_alignments(example_dir, golden_dir, tmp_path):
    """--alt-ali 2: X-masked re-alignments match the reference exactly."""
    params = SearchParams(alt_alignment=2)
    lines = easy_search(str(example_dir / "1tim.pdb.gz"),
                        str(example_dir / "8tim.pdb.gz"),
                        str(tmp_path / "alt.m8"), str(tmp_path / "tmp"), params)
    golden = [l.rstrip("\n") for l in open(golden_dir / "tim_altali.m8")]
    assert lines == golden


def test_alignment_type_3di_only(example_dir, golden_dir, tmp_path):
    """--alignment-type 0: 3Di-only scoring (zero AA matrix AND zero biases,
    structurealign.cpp:264-265 + StructureSmithWaterman.cpp:1564-1574).
    Golden from the reference binary."""
    from foldseek_tpu.cli import main
    out = tmp_path / "at0.m8"
    rc = main(["easy-search", str(example_dir / "1tim.pdb.gz"),
               str(example_dir / "8tim.pdb.gz"), str(out), str(tmp_path / "tmp"),
               "--alignment-type", "0", "--exhaustive-search", "1", "-v", "1"])
    assert rc == 0
    assert out.read_text() == (golden_dir / "tim_at0.m8").read_text()
