"""Extended output columns parity vs the reference golden
(qlen,tlen,qcov,tcov,qaln,taln,cigar,rmsd,prob,alntmscore,qtmscore,ttmscore,lddt)."""
import shutil

import pytest

EXT_FMT = ("query,target,fident,alnlen,mismatch,gapopen,qstart,qend,tstart,"
           "tend,evalue,bits,qlen,tlen,qcov,tcov,qaln,taln,cigar,rmsd,prob,"
           "alntmscore,qtmscore,ttmscore,lddt")


@pytest.fixture(scope="module")
def scop_dir(example_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("scop_ext")
    for f in example_dir.iterdir():
        if "tim" not in f.name:
            shutil.copy(f, d / f.name)
    return d


def test_ext_columns_golden(scop_dir, golden_dir, tmp_path):
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import easy_search
    params = SearchParams(format_output=EXT_FMT)
    lines = easy_search(str(scop_dir), str(scop_dir),
                        str(tmp_path / "ext.m8"), str(tmp_path / "tmp"), params)
    golden = [l.rstrip("\n") for l in open(golden_dir / "scop_ava_ext.m8")]
    assert len(lines) == len(golden)
    mine = {tuple(l.split("\t")[:2]): l.split("\t") for l in lines}
    ref = {}
    for l in golden:
        f = l.split("\t")
        ref[(f[0], f[1])] = f
    assert set(mine) == set(ref)
    text_exact = 0
    for k in ref:
        a, b = mine[k], ref[k]
        # exact-text columns: identity/counts/positions/cigar/alignments
        if a[:10] == b[:10] and a[12:19] == b[12:19]:
            text_exact += 1
        # float columns within tolerance: rmsd, prob, tm scores, lddt
        assert abs(float(a[19]) - float(b[19])) < 0.3, (k, "rmsd", a[19], b[19])
        for idx in (20, 21, 22, 23, 24):
            assert abs(float(a[idx]) - float(b[idx])) < 2e-2, (k, idx, a[idx], b[idx])
    assert text_exact >= len(ref) - 3, f"{text_exact}/{len(ref)} rows text-exact"


def test_extended_columns_vs_reference_binary(example_dir, tmp_path):
    """prob/qtmscore/ttmscore/alntmscore/rmsd/lddt/qaln/taln vs the
    reference binary (tests/golden/msa/ext_cols.tsv): every cross-pair
    cell is byte-identical; numeric cells carry tight float tolerances
    (rmsd: the reference's own iterative superposition leaves 0.02-0.04A
    self-hit artifacts where plain Kabsch gives ~0)."""
    import pathlib
    from foldseek_tpu.cli import main
    golden = (pathlib.Path(__file__).parent / "golden" / "msa" /
              "ext_cols.tsv").read_text().splitlines()
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    db = str(tmp_path / "db")
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    out = str(tmp_path / "ext.tsv")
    cols = ("query,target,prob,qtmscore,ttmscore,alntmscore,rmsd,"
            "lddt,qaln,taln")
    assert main(["convertalis", db, db, aln, out,
                 "--format-output", cols, "-v", "1"]) == 0
    mine = open(out).read().splitlines()
    assert len(mine) == len(golden)
    for a, b in zip(mine, golden):
        pa, pb = a.split("\t"), b.split("\t")
        for i, (x, y) in enumerate(zip(pa, pb)):
            if x == y:
                continue
            is_self = pa[0] == pa[1]
            # rmsd (col 6): the reference decodes Coordinate16-compressed
            # CA (int16 diffs at 0.001 A scale, ~5e-4 A noise per coord)
            # while this db stores raw float32 — rmsd at %.3f can differ
            # by 1-2 ulp-of-print; self-hits additionally carry the
            # reference's iterative-superposition artifact
            tol = 0.05 if (i == 6 and is_self) else (2e-3 if i == 6 else 5e-4)
            assert abs(float(x) - float(y)) <= tol, (i, x, y)


def test_set_and_3dialn_columns_vs_reference(example_dir, tmp_path):
    """q3dialn/t3dialn (aligned 3Di) and qset/qsetid/tset/tsetid
    (source-file set columns, sorted-order renumbering) byte-identical
    to the reference binary (tests/golden/msa/sets_cols.tsv)."""
    import pathlib
    from foldseek_tpu.cli import main
    golden = (pathlib.Path(__file__).parent / "golden" / "msa" /
              "sets_cols.tsv").read_text()
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    db = str(tmp_path / "db")
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    out = str(tmp_path / "sets.tsv")
    assert main(["convertalis", db, db, aln, out, "--format-output",
                 "query,target,q3dialn,t3dialn,qset,qsetid,tset,tsetid",
                 "-v", "1"]) == 0
    assert open(out).read() == golden


def test_complex_columns_vs_reference_binary(example_dir, golden_dir,
                                             tmp_path):
    """convertalis on a multimersearch (scoremultimer) result DB with the
    complex* column family vs the reference binary
    (tests/golden/timcomplex_cols.m8). Complex-specific cells are
    byte-compared: TM scores SSTR(double)=%.3E, coverages 0.000E+00 on
    unfiltered records, chainTms/interfaceLddt "0", assignid verbatim,
    qchains/tchains empty (the reference parses OUTFMT_COMPLEX_QNAME but
    has no renderer for it, structureconvertalis.cpp switch). u/t vectors
    numeric to 1e-3 (float32 superposition round-off); evalue/bits within
    the alignment-path band the timcomplex_report golden already uses."""
    from foldseek_tpu.cli import main
    golden = (golden_dir / "timcomplex_cols.m8").read_text().splitlines()
    qdb, tdb = str(tmp_path / "qdb"), str(tmp_path / "tdb")
    assert main(["createdb", str(example_dir / "1tim.pdb.gz"), qdb,
                 "-v", "1"]) == 0
    assert main(["createdb", str(example_dir / "8tim.pdb.gz"), tdb,
                 "-v", "1"]) == 0
    cres = str(tmp_path / "cres")
    assert main(["multimersearch", qdb, tdb, cres, str(tmp_path / "t"),
                 "-a", "-v", "1"]) == 0
    out = str(tmp_path / "cplx.m8")
    cols = ("query,target,fident,alnlen,evalue,bits,complexqtmscore,"
            "complexttmscore,complexu,complext,qcomplexcoverage,"
            "tcomplexcoverage,qchaintms,tchaintms,interfacelddt,"
            "complexassignid,qchains,tchains")
    assert main(["convertalis", qdb, tdb, cres, out,
                 "--format-output", cols, "-v", "1"]) == 0
    mine = open(out).read().splitlines()
    assert len(mine) == len(golden)
    for a, b in zip(mine, golden):
        pa, pb = a.split("\t"), b.split("\t")
        assert len(pa) == len(pb) == 18
        # query,target,fident,alnlen + every complex column except u/t:
        # byte-identical
        for i in (0, 1, 2, 3, 6, 7, 10, 11, 12, 13, 14, 15, 16, 17):
            assert pa[i] == pb[i], (i, pa[i], pb[i])
        # u (9 floats) to 1e-3; t (3 floats, Angstrom) to 0.05 — rotation
        # round-off is amplified into the translation by the centroid arm
        for i, tol in ((8, 1e-3), (9, 5e-2)):
            for x, y in zip(pa[i].split(","), pb[i].split(",")):
                assert abs(float(x) - float(y)) < tol, (i, x, y)


def test_complex_filter_columns_vs_reference_binary(example_dir, golden_dir,
                                                    tmp_path):
    """scoremultimer with --multimer-tm-threshold (21-col records: filter
    columns populated) -> convertalis complex columns, byte-identical to
    the reference binary (tests/golden/timcomplex_filt.m8): chain TM lists
    and interface LDDT echo the stored SSTR(float)=%.3f text, coverages
    re-format %.3E, assignment ids match."""
    from foldseek_tpu.cli import main
    golden = (golden_dir / "timcomplex_filt.m8").read_text()
    qdb, tdb = str(tmp_path / "qdb"), str(tmp_path / "tdb")
    assert main(["createdb", str(example_dir / "1tim.pdb.gz"), qdb,
                 "-v", "1"]) == 0
    assert main(["createdb", str(example_dir / "8tim.pdb.gz"), tdb,
                 "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", qdb, tdb, aln, str(tmp_path / "t"),
                 "-a", "-v", "1"]) == 0
    cres = str(tmp_path / "cresf")
    assert main(["scoremultimer", qdb, tdb, aln, cres,
                 "--multimer-tm-threshold", "0.5", "--cov-mode", "0",
                 "-v", "1"]) == 0
    out = str(tmp_path / "cplxf.m8")
    cols = ("query,target,bits,complexqtmscore,complexttmscore,"
            "qcomplexcoverage,tcomplexcoverage,qchaintms,tchaintms,"
            "interfacelddt,complexassignid")
    assert main(["convertalis", qdb, tdb, cres, out,
                 "--format-output", cols, "-v", "1"]) == 0
    assert open(out).read() == golden
