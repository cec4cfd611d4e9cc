"""LoLalign (alignment-type 3): golden comparison with tolerance."""
import shutil

import pytest


@pytest.fixture(scope="module")
def scop_dir(example_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("scop_lol")
    for f in example_dir.iterdir():
        if "tim" not in f.name:
            shutil.copy(f, d / f.name)
    return d


def test_lolalign_pair_values(example_dir, tmp_path):
    import numpy as np

    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.ops.lolalign import LoLAligner
    db = create_db([str(example_dir / "d1asha_"), str(example_dir / "d1mbaa_"),
                    str(example_dir / "d1or4a_")], str(tmp_path / "db"))
    names = {n: i for i, n in enumerate(db.names)}
    from foldseek_tpu.ops.matrices import blosum62
    lol = LoLAligner(multi_domain=True)
    qi = names["d1asha_"]
    lol.init_query(db.get_ca(qi), db.get_aa(qi), db.get_ss(qi),
                   blosum62(1.4).scores.astype(np.float32))
    # reference values (tests/golden/scop_lol.m8): globin pair
    # score 11645 / eval 0.4505, unrelated d1or4a_ 7085 / 0.2741
    r = lol.align(db.get_ca(names["d1mbaa_"]), db.get_aa(names["d1mbaa_"]),
                  db.get_ss(names["d1mbaa_"]))
    assert abs(r.score - 11645) / 11645 < 0.005, r.score
    assert abs(r.norm_score - 0.4505) / 0.4505 < 0.005, r.norm_score
    r2 = lol.align(db.get_ca(names["d1or4a_"]), db.get_aa(names["d1or4a_"]),
                   db.get_ss(names["d1or4a_"]))
    assert abs(r2.score - 7085) / 7085 < 0.05, r2.score
    assert r.score > r2.score


def test_lolalign_scop_golden(scop_dir, golden_dir, tmp_path):
    import numpy as np

    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import easy_search
    lines = easy_search(str(scop_dir), str(scop_dir),
                        str(tmp_path / "lol.m8"), str(tmp_path / "tmp"),
                        SearchParams(alignment_type=3))
    golden = [l.rstrip("\n") for l in open(golden_dir / "scop_lol.m8")]

    def parse(ls):
        return {(f[0], f[1]): (float(f[10]), int(f[11]))
                for f in (l.split("\t") for l in ls)}

    mine, ref = parse(lines), parse(golden)
    shared = set(mine) & set(ref)
    assert len(shared) >= len(ref) - 10
    rel = [abs(mine[k][1] - ref[k][1]) / max(ref[k][1], 1) for k in shared]
    assert np.median(rel) < 0.02, np.median(rel)
    rel_e = [abs(mine[k][0] - ref[k][0]) / max(ref[k][0], 1e-9) for k in shared]
    assert np.median(rel_e) < 0.02, np.median(rel_e)
