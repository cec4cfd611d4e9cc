"""3Di encoder parity vs reference createdb output (golden fixtures)."""
import json

import numpy as np
import pytest

from foldseek_tpu.ingest import encoder3di, pdb
from foldseek_tpu.ingest.createdb import create_db


@pytest.fixture(scope="module")
def golden_3di(golden_dir):
    with open(golden_dir / "example_3di.json") as f:
        return json.load(f)


def test_3di_parity_all_examples(golden_3di, example_dir, tmp_path):
    db = create_db([str(example_dir)], str(tmp_path / "exdb"))
    by_name = {n: i for i, n in enumerate(db.names)}
    assert len(by_name) == len(golden_3di), (sorted(by_name), sorted(golden_3di))
    mismatches = []
    for name, entry in golden_3di.items():
        i = by_name[name]
        aa = db.get_aa_str(i)
        ss = db.get_ss_str(i)
        if aa != entry["aa"]:
            mismatches.append((name, "aa", aa, entry["aa"]))
        if ss != entry["ss"]:
            diff = sum(a != b for a, b in zip(ss, entry["ss"]))
            mismatches.append((name, f"ss ({diff}/{len(ss)} differ)", ss[:60], entry["ss"][:60]))
    assert not mismatches, mismatches[:4]


def test_encoder_invalid_residues():
    # chain with a missing CA in the middle -> coil states around it
    st = pdb.parse_structure("/root/reference/example/d1asha_")
    ch = st.chains[0]
    ca = ch.ca.copy()
    ca[10] = np.nan
    states = encoder3di.encode_chain(ca, ch.n, ch.c, ch.cb)
    assert states[10] == encoder3di.INVALID_STATE
    assert states[0] == encoder3di.INVALID_STATE
    assert states[-1] == encoder3di.INVALID_STATE
