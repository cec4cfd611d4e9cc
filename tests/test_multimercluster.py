"""Multimer clustering golden parity (1tim+8tim complexes + two globins)."""
import shutil


def test_easy_multimercluster_golden(example_dir, golden_dir, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    for name in ("1tim.pdb.gz", "8tim.pdb.gz", "d1asha_", "d1mbaa_"):
        shutil.copy(example_dir / name, inp / name)
    from foldseek_tpu.cli import main
    rc = main(["easy-multimercluster", str(inp), str(tmp_path / "clu"),
               str(tmp_path / "tmp"), "-v", "1"])
    assert rc == 0
    mine = open(tmp_path / "clu_cluster.tsv").read()
    golden = open(golden_dir / "mmclu_cluster.tsv").read()
    assert mine == golden
    # rep fasta contains the representative complexes with '#' separators
    fasta = open(tmp_path / "clu_rep_seq.fasta").read()
    assert "#8tim" in fasta and "#d1asha_" in fasta and "#1tim" not in fasta
