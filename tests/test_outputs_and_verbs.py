"""Output modes (SAM/HTML/superposed PDB) + utility verbs + coords codec."""
import os

import numpy as np
import pytest


def test_coords16_roundtrip():
    from foldseek_tpu.db.coords16 import decode_ca, encode_ca
    rng = np.random.RandomState(0)
    ca = np.cumsum(rng.randn(200, 3).astype(np.float32) * 2.0, axis=0)
    payload, compressed = encode_ca(ca)
    assert compressed and len(payload) == 3 * (4 + 2 * 199)
    out = decode_ca(payload, 200)
    assert np.abs(out - np.round(ca * 1000) / 1000.0).max() < 2e-3
    # overflow fallback keeps exact floats
    ca[100] += 1e5
    payload, compressed = encode_ca(ca)
    assert not compressed
    assert np.array_equal(decode_ca(payload, 200), ca)


@pytest.fixture(scope="module")
def tim_db(example_dir, tmp_path_factory):
    from foldseek_tpu.ingest.createdb import create_db
    d = tmp_path_factory.mktemp("verbs")
    return create_db([str(example_dir / "1tim.pdb.gz")], str(d / "db"))


def test_output_modes(tim_db, example_dir, tmp_path):
    from foldseek_tpu.search.convertalis import write_output
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import search
    params = SearchParams(exhaustive_search=True, add_backtrace=True)
    results = search(tim_db, tim_db, params, same_db=True)
    write_output(tim_db, tim_db, results, str(tmp_path / "out.sam"),
                 format_mode=1, with_backtrace=True)
    sam = open(tmp_path / "out.sam").read()
    assert sam.startswith("@HD") and "@SQ\tSN:1tim_A" in sam
    write_output(tim_db, tim_db, results, str(tmp_path / "out.html"),
                 format_mode=3, with_backtrace=True)
    html = open(tmp_path / "out.html").read()
    assert "<table" in html and "1tim_A" in html
    write_output(tim_db, tim_db, results, str(tmp_path / "sup_"),
                 format_mode=5, with_backtrace=True)
    pdbs = [f for f in os.listdir(tmp_path) if f.startswith("sup_")]
    assert len(pdbs) == 4  # 2x2 chain pairs
    body = open(tmp_path / pdbs[0]).read()
    assert body.startswith("MODEL") and "ATOM" in body


def test_createsubdb_and_compressca(tim_db, tmp_path):
    from foldseek_tpu.cli import main
    lst = tmp_path / "keep.txt"
    lst.write_text("1tim_A\n")
    rc = main(["createsubdb", str(lst), tim_db.path, str(tmp_path / "sub"),
               "-v", "1"])
    assert rc == 0
    from foldseek_tpu.db.storage import load_db
    sub = load_db(str(tmp_path / "sub"))
    assert sub.size == 1 and sub.names == ["1tim_A"]
    rc = main(["compressca", tim_db.path, str(tmp_path / "ca16.bin"), "-v", "1"])
    assert rc == 0
    offs = np.load(str(tmp_path / "ca16.bin.offsets.npy"))
    assert offs[-1] < tim_db.total_residues * 12 * 0.55


def test_databases_listing(capsys):
    from foldseek_tpu.cli import main
    assert main(["databases"]) == 0
    out = capsys.readouterr().out
    assert "ProstT5" in out and "PDB" in out


def test_createdb_tar_input(example_dir, tmp_path):
    import tarfile

    from foldseek_tpu.ingest.createdb import create_db
    tar_path = tmp_path / "structs.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        tf.add(example_dir / "d1asha_", arcname="d1asha_")
        tf.add(example_dir / "1tim.pdb.gz", arcname="1tim.pdb.gz")
    db = create_db([str(tar_path)], str(tmp_path / "db"))
    assert db.size == 3  # d1asha_ + 1tim chains A/B
    assert "d1asha_" in db.names and "1tim_A" in db.names


def test_gpu_flag_forces_ungapped_prefilter():
    """--gpu 1 maps to prefilter mode 1 like the reference forcing UNGAPPED
    when gpu=1 (StructureSearch.cpp:110-112); an explicit mode wins."""
    import argparse

    from foldseek_tpu.cli import _add_search_params, params_from_args
    p = argparse.ArgumentParser()
    p.add_argument("x")
    _add_search_params(p)
    assert params_from_args(p.parse_args(["q", "--gpu", "1"])).prefilter_mode == 1
    assert params_from_args(p.parse_args(["q"])).prefilter_mode == 0
    assert params_from_args(
        p.parse_args(["q", "--gpu", "1", "--prefilter-mode", "2"])
    ).prefilter_mode == 2


def test_html_3d_superposition(tim_db, tmp_path):
    """Format-mode-3 HTML embeds per-hit TM-superposed C-alpha traces +
    the canvas viewer (reference: structureconvertalis.cpp:505-537's
    interactive report)."""
    import json
    import re

    from foldseek_tpu.search.convertalis import write_output
    from foldseek_tpu.search.pipeline import search
    from foldseek_tpu.search.params import SearchParams
    results = search(tim_db, tim_db, SearchParams(add_backtrace=True,
                                                  exhaustive_search=True))
    out = tmp_path / "view.html"
    write_output(tim_db, tim_db, results, str(out), format_mode=3,
                 with_backtrace=True)
    html = open(out).read()
    m = re.search(r"var COORDS = (\[.*?\]);\n", html, re.S)
    coords = json.loads(m.group(1))
    n_hits = sum(len(v) for v in results.values())
    assert len(coords) == n_hits
    for c in coords:
        assert len(c["q"]) > 0 and len(c["t"]) > 0
        assert len(c["q"][0]) == 3
    assert html.count('class="v3d"') == n_hits
    assert "show3d" in html and "getContext" in html
    script = html[html.index("<script>"):html.index("</script>")]
    assert script.count("{") == script.count("}")


def test_convert2pdb_parity_vs_reference(example_dir, tmp_path):
    """convert2pdb matches the reference binary's output line-for-line
    (tests/golden/msa/convert2pdb.pdb); coordinates may differ by one
    milli-Angstrom where the reference's Coordinate16 int16-diff storage
    quantized (ours stores exact float32 — strictly more accurate)."""
    import pathlib
    from foldseek_tpu.cli import main
    golden = (pathlib.Path(__file__).parent / "golden" / "msa" /
              "convert2pdb.pdb").read_text().splitlines()
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    db = str(tmp_path / "db")
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    out = str(tmp_path / "out.pdb")
    assert main(["convert2pdb", db, out, "-v", "1"]) == 0
    mine = open(out).read().splitlines()
    assert len(mine) == len(golden)
    for a, b in zip(mine, golden):
        if a == b:
            continue
        assert a[:30] == b[:30], (a, b)  # record/name fields identical
        ca = [float(a[30:38]), float(a[38:46]), float(a[46:54])]
        cb = [float(b[30:38]), float(b[38:46]), float(b[46:54])]
        assert all(abs(x - y) <= 0.0011 for x, y in zip(ca, cb)), (a, b)


def test_aln2tmscore_parity_vs_reference(example_dir, tmp_path):
    """aln2tmscore vs the reference binary (tests/golden/msa/
    aln2tmscore.tsv): TM column byte-identical ("%.3E"); t/u within the
    float32-vs-float64 superposition rounding band (+-0.0015, signed
    zeros normalized)."""
    import pathlib
    from foldseek_tpu.cli import main
    from foldseek_tpu.db.storage import load_db
    golden = (pathlib.Path(__file__).parent / "golden" / "msa" /
              "aln2tmscore.tsv").read_text().splitlines()
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    db = str(tmp_path / "db")
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    out = str(tmp_path / "tm")
    assert main(["aln2tmscore", db, db, aln, out, "-v", "1"]) == 0
    dbo = load_db(db)
    kn = {str(int(dbo.keys[i])): dbo.names[i] for i in range(dbo.size)}
    ref = {}
    for line in golden:
        q, rest = line.split("\t", 1)
        t, vals = rest.split(" ", 1)
        ref[(q, t)] = vals.split()
    n = 0
    for line in open(out):
        q, rest = line.rstrip("\n").split("\t", 1)
        parts = rest.split(" ")
        rv = ref[(kn[q], kn[parts[0]])]
        assert parts[1] == rv[0]  # TM "%.3E" byte-identical
        for a, b in zip(parts[2:], rv[1:]):
            assert abs(float(a) - float(b)) <= 0.0015, (q, parts[0], a, b)
        n += 1
    assert n == len(ref)


def test_sam_output_byte_exact_vs_reference(example_dir, tmp_path):
    """convertalis --format-mode 1 is byte-identical to the reference
    binary's SAM output (tests/golden/msa/out.sam): ALP raw scores
    (AS:i), m8 mismatch counts (NM:i), and the reference's MAPQ
    exp-underflow quirk all reproduced."""
    import pathlib
    from foldseek_tpu.cli import main
    golden = (pathlib.Path(__file__).parent / "golden" / "msa" /
              "out.sam").read_text()
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    db = str(tmp_path / "db")
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    out = str(tmp_path / "out.sam")
    assert main(["convertalis", db, db, aln, out, "--format-mode", "1",
                 "-v", "1"]) == 0
    assert open(out).read() == golden


def test_format_mode2_byte_exact_vs_reference(example_dir, tmp_path):
    """--format-mode 2 (BLAST-TAB + qlen/tlen, %.2E e-values) matches the
    reference binary byte-for-byte (tests/golden/msa/mode2.tsv)."""
    import pathlib
    from foldseek_tpu.cli import main
    golden = (pathlib.Path(__file__).parent / "golden" / "msa" /
              "mode2.tsv").read_text()
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    db = str(tmp_path / "db")
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    out = str(tmp_path / "m2.tsv")
    assert main(["convertalis", db, db, aln, out, "--format-mode", "2",
                 "-v", "1"]) == 0
    assert open(out).read() == golden


def test_format_mode4_byte_exact_vs_reference(example_dir, tmp_path):
    """--format-mode 4 (BLAST-TAB + column-name header row) matches the
    reference binary byte-for-byte (tests/golden/msa/mode4.tsv)."""
    import pathlib
    from foldseek_tpu.cli import main
    golden = (pathlib.Path(__file__).parent / "golden" / "msa" /
              "mode4.tsv").read_text()
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    db = str(tmp_path / "db")
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    out = str(tmp_path / "m4.tsv")
    assert main(["convertalis", db, db, aln, out, "--format-mode", "4",
                 "-v", "1"]) == 0
    assert open(out).read() == golden


def test_format_mode5_superposed_parity_vs_reference(example_dir, tmp_path):
    """--format-mode 5 (per-hit TM-superposed C-alpha PDB) matches the
    reference binary line-for-line (tests/golden/msa/sup/), coordinates
    within the Coordinate16-quantization + float32 superposition band
    (2 milli-Angstrom)."""
    import pathlib
    from foldseek_tpu.cli import main
    gdir = pathlib.Path(__file__).parent / "golden" / "msa" / "sup"
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    db = str(tmp_path / "db")
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    prefix = str(tmp_path / "sup")
    assert main(["convertalis", db, db, aln, prefix, "--format-mode", "5",
                 "-v", "1"]) == 0
    n = 0
    for g in sorted(gdir.glob("ref_sup*.pdb")):
        mine = prefix + g.name[len("ref_sup"):]
        glines = g.read_text().splitlines()
        mlines = open(mine).read().splitlines()
        assert len(mlines) == len(glines), g.name
        for a, b in zip(mlines, glines):
            if a == b:
                continue
            assert a[:30] == b[:30] and a[54:] == b[54:], (g.name, a, b)
            ca = [float(a[30:38]), float(a[38:46]), float(a[46:54])]
            cb = [float(b[30:38]), float(b[38:46]), float(b[46:54])]
            assert all(abs(x - y) <= 0.002 for x, y in zip(ca, cb)), (a, b)
        n += 1
    assert n == 16
