"""mmJSON ingest parity: the JSON rendering of a structure must parse to
identical chains/3Di as the PDB rendering (reference reads mmJSON via
gemmi, src/strucclustutils/GemmiWrapper.cpp:504-517)."""
import gzip
import json

import numpy as np


def _pdb_to_mmjson(text: str) -> str:
    cols = {k: [] for k in (
        "group_PDB", "label_atom_id", "label_alt_id", "label_comp_id",
        "auth_asym_id", "auth_seq_id", "pdbx_PDB_ins_code",
        "Cartn_x", "Cartn_y", "Cartn_z", "B_iso_or_equiv",
        "pdbx_PDB_model_num")}
    for ln in text.splitlines():
        if not ln.startswith(("ATOM", "HETATM")):
            continue
        cols["group_PDB"].append(ln[:6].strip())
        cols["label_atom_id"].append(ln[12:16].strip())
        cols["label_alt_id"].append(ln[16].strip() or None)
        cols["label_comp_id"].append(ln[17:20].strip())
        cols["auth_asym_id"].append(ln[21].strip())
        cols["auth_seq_id"].append(int(ln[22:26]))
        cols["pdbx_PDB_ins_code"].append(ln[26].strip() or None)
        cols["Cartn_x"].append(float(ln[30:38]))
        cols["Cartn_y"].append(float(ln[38:46]))
        cols["Cartn_z"].append(float(ln[46:54]))
        cols["B_iso_or_equiv"].append(float(ln[60:66]))
        cols["pdbx_PDB_model_num"].append(1)
    return json.dumps({"data_X": {"atom_site": cols,
                                  "struct": {"title": ["json test"]}}})


def test_mmjson_matches_pdb(example_dir, tmp_path):
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.ingest.pdb import parse_structure
    text = gzip.open(example_dir / "1tim.pdb.gz", "rt").read()
    p = tmp_path / "1tim.json"
    p.write_text(_pdb_to_mmjson(text))
    stj = parse_structure(str(p))
    stp = parse_structure(str(example_dir / "1tim.pdb.gz"))
    assert stj.title == "json test"
    assert len(stj.chains) == len(stp.chains) == 2
    for cj, cp in zip(stj.chains, stp.chains):
        assert cj.aa == cp.aa
        assert np.allclose(np.nan_to_num(cj.ca), np.nan_to_num(cp.ca))
        assert np.allclose(np.nan_to_num(cj.cb), np.nan_to_num(cp.cb))
    dbj = create_db([str(p)], str(tmp_path / "dbj"))
    dbp = create_db([str(example_dir / "1tim.pdb.gz")], str(tmp_path / "dbp"))
    assert [dbj.get_ss_str(i) for i in range(dbj.size)] == \
           [dbp.get_ss_str(i) for i in range(dbp.size)]


def test_zstd_ingest(example_dir, tmp_path):
    """.pdb.zst input decompressed via system libzstd (reference ingests
    zstd through its vendored lib, GemmiWrapper.cpp load)."""
    import gzip

    import pytest

    from foldseek_tpu.utils import zstd
    if not zstd.available():
        pytest.skip("libzstd not on this system")
    raw = gzip.open(example_dir / "1tim.pdb.gz", "rb").read()
    assert zstd.decompress(zstd.compress(raw)) == raw
    p = tmp_path / "1tim.pdb.zst"
    p.write_bytes(zstd.compress(raw))
    from foldseek_tpu.ingest.createdb import create_db
    db = create_db([str(p)], str(tmp_path / "db"))
    dbg = create_db([str(example_dir / "1tim.pdb.gz")], str(tmp_path / "dbg"))
    assert db.size == dbg.size == 2
    assert [db.get_ss_str(i) for i in range(2)] == [dbg.get_ss_str(i) for i in range(2)]
    assert db.names == dbg.names


def test_chemcomp_cif_ingest():
    """Chemical-component CIF (CCD entry) parses to a single-residue chain
    (GemmiWrapper Format::ChemComp, gemmi chemcomp_xyz.hpp); createdb then
    drops it as too short, exactly like the reference."""
    from foldseek_tpu.ingest.pdb import parse_structure_text
    ccd = "\n".join([
        "data_ALA", "#", "_chem_comp.id ALA", "loop_",
        "_chem_comp_atom.comp_id", "_chem_comp_atom.atom_id",
        "_chem_comp_atom.type_symbol", "_chem_comp_atom.model_Cartn_x",
        "_chem_comp_atom.model_Cartn_y", "_chem_comp_atom.model_Cartn_z",
        "ALA N N -0.966 0.493 1.500",
        "ALA CA C 0.257 0.418 0.692",
        "ALA C C -0.094 0.017 -0.716",
        "ALA O O -1.056 -0.682 -0.923",
        "ALA CB C 1.204 -0.620 1.296", "#", ""])
    st = parse_structure_text(ccd, "ALA.cif")
    assert len(st.chains) == 1
    assert st.chains[0].aa == "A"
    assert st.chains[0].ca.shape == (1, 3)
