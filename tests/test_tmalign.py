"""Full TM-align (alignment-type 1) golden parity on the SCOP examples."""
import shutil

import pytest


@pytest.fixture(scope="module")
def scop_dir(example_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("scop_tma")
    for f in example_dir.iterdir():
        if "tim" not in f.name:
            shutil.copy(f, d / f.name)
    return d


def test_tmalign_pair_values(example_dir, tmp_path):
    import numpy as np

    from foldseek_tpu.db.storage import load_db
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.ops.tmalign import tmalign
    db = create_db([str(example_dir / "d1asha_"), str(example_dir / "d1mbaa_")],
                   str(tmp_path / "db"))
    r = tmalign(db.get_ca(0), db.get_ca(1), db.get_aa(0), db.get_aa(1))
    # reference easy-search --alignment-type 1: avg TM 8.464E-01, qTM 84
    assert abs((r.tm_query + r.tm_target) / 2.0 - 0.8464) < 2e-3
    assert int(r.tm_query * 100) == 84


def test_easy_search_tmalign_scop_golden(scop_dir, golden_dir, tmp_path):
    """easy-search --alignment-type 1 over the 26 SCOP domains vs the
    reference golden: same hit set, TM columns within 0.01."""
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import easy_search
    params = SearchParams(alignment_type=1)
    lines = easy_search(str(scop_dir), str(scop_dir),
                        str(tmp_path / "scop_tma.m8"), str(tmp_path / "tmp"),
                        params)
    golden = [l.rstrip("\n") for l in open(golden_dir / "scop_tmalign.m8")]

    def parse(ls):
        out = {}
        for l in ls:
            f = l.split("\t")
            out[(f[0], f[1])] = (float(f[10]), int(f[11]))
        return out

    mine, ref = parse(lines), parse(golden)
    shared = set(mine) & set(ref)
    # hit sets match except at most a few borderline pairs
    assert len(shared) >= len(ref) - 6, (len(shared), len(ref))
    close = sum(1 for k in shared
                if abs(mine[k][0] - ref[k][0]) < 0.01
                and abs(mine[k][1] - ref[k][1]) <= 1)
    assert close >= len(shared) * 0.97, f"{close}/{len(shared)} TM values close"


def test_nw_gotoh_reference_matches_fast():
    """The plain-python nw_gotoh is the specification the vectorized /
    native implementations are held to — keep them bit-identical."""
    import numpy as np

    from foldseek_tpu.ops.tmalign import _nw_gotoh_fast, nw_gotoh
    rng = np.random.default_rng(5)
    for ylen, xlen in ((7, 9), (33, 21), (64, 64)):
        score = rng.normal(scale=3.0, size=(ylen, xlen)).astype(np.float32)
        a = nw_gotoh(score, 10.0, 1.0)
        b = _nw_gotoh_fast(score, 10.0, 1.0)
        assert (a == b).all()


def test_tmalign_hit_order_flag(example_dir, tmp_path):
    """--tmalign-hit-order changes the ordering TM (qTM vs tTM) through
    the CLI (LocalParameters.h:41-45); evalue column carries the order
    TM in tmalign mode."""
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db
    db = str(tmp_path / "db")
    files = [str(example_dir / n) for n in ("d1asha_", "d1mbaa_")]
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    base = str(tmp_path / "base")
    assert main(["search", db, db, base, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-v", "1"]) == 0
    outq = str(tmp_path / "oq")
    outt = str(tmp_path / "ot")
    assert main(["tmalign", db, db, base, outq,
                 "--tmalign-hit-order", "1", "-v", "1"]) == 0
    assert main(["tmalign", db, db, base, outt,
                 "--tmalign-hit-order", "2", "-v", "1"]) == 0
    rq, _ = read_result_db(outq)
    rt, _ = read_result_db(outt)
    # cross-pair with different lengths: qTM != tTM
    cross_q = next(r for r in rq[0] if r.db_key != 0)
    cross_t = next(r for r in rt[0] if r.db_key != 0)
    assert cross_q.evalue != cross_t.evalue
