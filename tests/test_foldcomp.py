"""Foldcomp (.fcz) decoder: backbone accuracy + exact 3Di/AA parity.

Golden: tests/golden/d1asha_fcz_3di.tsv is the reference binary's
`structureto3didescriptor` output for tests/golden/d1asha.fcz (itself
written by the reference from example/d1asha_)."""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
FCZ = os.path.join(GOLDEN, "d1asha.fcz")


def _golden_cols():
    line = open(os.path.join(GOLDEN, "d1asha_fcz_3di.tsv")).read().rstrip("\n")
    return line.split("\t")


def test_decode_backbone(example_dir):
    from foldseek_tpu.ingest.foldcomp import read_fcz
    from foldseek_tpu.ingest.pdb import parse_structure
    st = read_fcz(FCZ)
    ch = parse_structure(str(example_dir / "d1asha_")).chains[0]
    assert st.residues == ch.aa
    for mine, true in ((st.ca, ch.ca), (st.n, ch.n), (st.c, ch.c)):
        rmsd = float(np.sqrt(np.mean(np.sum((mine - true) ** 2, axis=1))))
        assert rmsd < 0.15  # foldcomp's documented ~0.1A lossy error


def test_createdb_fcz_3di_parity(tmp_path):
    from foldseek_tpu.ingest.createdb import create_db
    db = create_db([FCZ], str(tmp_path / "db"))
    cols = _golden_cols()
    assert db.size == 1
    assert db.get_aa_str(0) == cols[1]
    assert db.get_ss_str(0) == cols[2]


def test_foldcomp_db_container(tmp_path):
    # DB-style container: data file of concatenated FCMP entries + .index
    from foldseek_tpu.ingest.createdb import create_db
    raw = open(FCZ, "rb").read()
    data = tmp_path / "fcdb"
    data.write_bytes(raw + raw)
    (tmp_path / "fcdb.index").write_text(
        f"0\t0\t{len(raw)}\n1\t{len(raw)}\t{len(raw)}\n")
    (tmp_path / "fcdb.lookup").write_text("0\tentryA\t0\n1\tentryB\t0\n")
    db = create_db([str(data)], str(tmp_path / "db"))
    cols = _golden_cols()
    assert db.size == 2
    assert sorted(db.names) == ["entryA", "entryB"]
    assert db.get_ss_str(0) == db.get_ss_str(1) == cols[2]


def test_fcz_in_tar(tmp_path):
    import tarfile
    from foldseek_tpu.ingest.createdb import create_db
    tar = tmp_path / "in.tar"
    with tarfile.open(tar, "w") as tf:
        tf.add(FCZ, arcname="d1asha.fcz")
    db = create_db([str(tar)], str(tmp_path / "db"))
    assert db.size == 1 and db.get_ss_str(0) == _golden_cols()[2]


def test_seqdist_alphabet(example_dir):
    """3Di seq-dist variant (structureto3diseqdist.cpp): terminal residues
    keep mask=true with partner=-1, so they discretize seqDistance=-1-i
    exactly like the reference's loop does."""
    import numpy as np

    from foldseek_tpu.ingest.encoder3di import (SEQDIST_CENTROIDS,
                                                encode_chain_seqdist)
    from foldseek_tpu.ingest.pdb import parse_structure
    ch = parse_structure(str(example_dir / "d1asha_")).chains[0]
    st = encode_chain_seqdist(ch.ca, ch.n, ch.c, ch.cb)
    assert st.shape == (len(ch.aa),)
    assert ((st >= 0) & (st < 20)).all()
    # residue 0: partner -1 -> seqDistance -1 -> nearest centroid is -1 (idx 10)
    assert st[0] == 10
    # interior states should reflect real partner offsets: mostly short-range
    # (helix contacts at |offset| 3-4 -> centroid indices around 7-13)
    inner = st[1:-1]
    assert (np.abs(SEQDIST_CENTROIDS[inner]) <= 40).mean() > 0.5


def test_encode_roundtrip_and_reference_layout(example_dir, golden_dir):
    """encode_fcz must round-trip through our decoder and reproduce the
    reference binary's own export byte-for-byte except its uninitialized
    header padding and one-ULP float rounding in the discretizer params
    (verified externally: the reference binary decodes our blob to
    byte-identical AA + 3Di strings)."""
    import numpy as np

    from foldseek_tpu.ingest.foldcomp import decode_fcz, encode_fcz
    from foldseek_tpu.ingest.pdb import parse_structure
    ch = parse_structure(str(example_dir / "d1asha_")).chains[0]
    blob = encode_fcz(np.asarray(ch.n, np.float32), np.asarray(ch.ca, np.float32),
                      np.asarray(ch.c, np.float32), ch.aa,
                      bfactor=ch.bfactor, idx_atom=1)
    ref = (golden_dir / "d1asha.fcz").read_bytes()
    assert len(blob) == len(ref)
    pad = {14, 15}  # reference writes uninitialized struct padding here
    diffs = [i for i in range(len(blob)) if blob[i] != ref[i] and i not in pad]
    assert all(24 <= i < 72 for i in diffs), diffs  # only discretizer floats
    assert len(diffs) <= 8
    st = decode_fcz(blob)
    assert st.residues == ch.aa
    rmsd = float(np.sqrt(np.mean(np.sum(
        (st.ca - np.asarray(ch.ca, np.float32)) ** 2, axis=1))))
    assert rmsd < 0.15


def test_convert2foldcomp_verb(example_dir, tmp_path):
    from foldseek_tpu.cli import main
    from foldseek_tpu.ingest.createdb import create_db
    out = str(tmp_path / "fcdb")
    assert main(["convert2foldcomp", str(example_dir / "d1asha_"),
                 str(example_dir / "1tim.pdb.gz"), out, "-v", "1"]) == 0
    db = create_db([out], str(tmp_path / "db"))
    assert db.size == 3  # d1asha_ + 1tim chains A/B
    # backbone coordinates survive the codec (~0.1 A); the 3Di drifts more
    # because backbone-only fcz reconstructs degenerate CBs — the reference's
    # own foldseek export has the identical behavior (byte-level parity above)
    import numpy as np
    direct = create_db([str(example_dir / "1tim.pdb.gz")], str(tmp_path / "dbd"))
    for name in ("1tim_A", "1tim_B"):
        i, j = db.names.index(name), direct.names.index(name)
        rmsd = float(np.sqrt(np.mean(np.sum(
            (db.get_ca(i) - direct.get_ca(j)) ** 2, axis=1))))
        assert rmsd < 0.15, (name, rmsd)
        a, b = db.get_ss_str(i), direct.get_ss_str(j)
        ident = sum(x == y for x, y in zip(a, b)) / len(b)
        assert ident > 0.4, (name, ident)


def test_descriptor_features_vs_reference(tmp_path, example_dir):
    """The full 4-column descriptor (incl. the 10 raw features per
    residue, "%.3E" comma-joined): byte-identical to the reference
    binary on a plain PDB input (golden/msa/d1asha_desc.tsv); on the
    fcz golden the name/AA/3Di columns are byte-exact and features
    match within one printed digit (both sides re-derive coordinates
    through their own foldcomp NeRF decode — 1-ulp float rounding)."""
    from foldseek_tpu.cli import main
    out = str(tmp_path / "plain.tsv")
    assert main(["structureto3didescriptor",
                 str(example_dir / "d1asha_"), out, "-v", "1"]) == 0
    plain_golden = open(os.path.join(GOLDEN, "msa", "d1asha_desc.tsv")).read()
    assert open(out).read() == plain_golden
    out2 = str(tmp_path / "fcz.tsv")
    assert main(["structureto3didescriptor", FCZ, out2, "-v", "1"]) == 0
    g = open(os.path.join(GOLDEN, "d1asha_fcz_3di.tsv")).read().rstrip("\n").split("\t")
    m = open(out2).read().rstrip("\n").split("\t")
    assert m[:3] == g[:3]
    gf = [float(x) for x in g[3].split(",")]
    mf = [float(x) for x in m[3].split(",")]
    assert len(gf) == len(mf)
    assert max(abs(a - b) for a, b in zip(gf, mf)) <= 2e-4
