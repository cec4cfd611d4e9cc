"""Multimer search: easy-multimersearch golden parity on 1tim vs 8tim."""
import pytest


def test_easy_multimersearch_tim_golden(example_dir, golden_dir, tmp_path):
    from foldseek_tpu.multimer.workflow import easy_multimer_search
    from foldseek_tpu.search.params import SearchParams
    report = easy_multimer_search(
        str(example_dir / "1tim.pdb.gz"), str(example_dir / "8tim.pdb.gz"),
        str(tmp_path / "tim"), str(tmp_path / "tmp"), SearchParams())
    golden = [l.rstrip("\n") for l in open(golden_dir / "timcomplex_report")]
    assert len(report) == len(golden)
    for mine, ref in zip(report, golden):
        fm, fr = mine.split("\t"), ref.split("\t")
        # complex names, chain lists, assignment id must match exactly
        assert fm[:4] == fr[:4]
        assert fm[13] == fr[13]
        # TM scores to 1e-4 (float32 Kabsch round-off)
        assert abs(float(fm[4]) - float(fr[4])) < 1e-4, (mine, ref)
        assert abs(float(fm[5]) - float(fr[5])) < 1e-4, (mine, ref)
        # superposition u/t close
        for um, ur in zip(fm[6].split(","), fr[6].split(",")):
            assert abs(float(um) - float(ur)) < 1e-3
