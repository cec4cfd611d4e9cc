"""Ungapped prefilter parity vs reference `ungappedprefilter` fixture, and
Pallas-vs-scalar kernel equivalence (interpret mode on CPU)."""
import json

import numpy as np
import pytest

from foldseek_tpu.ingest.createdb import create_db
from foldseek_tpu.ops.gapless import gapless_scores_np
from foldseek_tpu.ops.gapless_pallas import (gapless_scores_single,
                                             pack_profile, prepare_targets_T)
from foldseek_tpu.ops.matrices import mat3di
from foldseek_tpu.search.params import SearchParams
from foldseek_tpu.search.ungapped import UngappedPrefilter


@pytest.fixture(scope="module")
def exdb(example_dir, tmp_path_factory):
    return create_db([str(example_dir)], str(tmp_path_factory.mktemp("db") / "exdb"))


def test_ungapped_prefilter_parity(exdb, golden_dir):
    with open(golden_dir / "upref.json") as f:
        golden = json.load(f)
    pref = UngappedPrefilter(exdb)
    params = SearchParams()
    name_by_key = {int(exdb.keys[i]): exdb.names[i] for i in range(exdb.size)}
    for qi in range(exdb.size):
        hits = pref.query(np.asarray(exdb.get_ss(qi)), params)
        mine = [[name_by_key[k], s] for k, s in hits]
        gold = [[t, s] for t, s, _ in golden[exdb.names[qi]]]
        assert mine == gold, exdb.names[qi]


def test_pallas_kernel_vs_scalar(exdb):
    import jax.numpy as jnp
    m3 = mat3di(2.0, 0.0)
    q_ss = np.asarray(exdb.get_ss(0))
    prof = m3.scores[:, q_ss].astype(np.float32)
    seqs = [np.asarray(exdb.get_ss(i)) for i in range(8)]
    lens = [len(s) for s in seqs]
    t_T = prepare_targets_T(seqs, lens)
    scores = np.asarray(gapless_scores_single(
        jnp.asarray(pack_profile(prof)), jnp.asarray(t_T)))
    zeros = np.zeros_like(prof[:, :1]).repeat(prof.shape[1], axis=1)
    for i, seq in enumerate(seqs):
        ref = gapless_scores_np(prof.astype(np.int64), zeros.astype(np.int64),
                                seq, np.zeros_like(seq))
        assert int(scores[i]) == ref, i


def test_query_batch_matches_single(exdb):
    """Multi-query stacked kernel + bucketed panels == per-query results."""
    params = SearchParams()
    pref = UngappedPrefilter(exdb)
    seqs = [np.asarray(exdb.get_ss(i)) for i in range(exdb.size)]
    batched = pref.query_batch(seqs, params)
    for qi in range(exdb.size):
        single = pref.query(seqs[qi], params)
        assert batched[qi] == single, exdb.names[qi]


def test_split_streaming_matches_unsplit(tmp_path):
    """A device-memory budget ~4x smaller than the panels must stream splits
    and still produce identical prefilter output (TARGET_DB_SPLIT analogue,
    Prefiltering.cpp:289-381)."""
    from foldseek_tpu.db.storage import StructDBWriter
    rng = np.random.RandomState(11)
    w = StructDBWriter(str(tmp_path / "bigdb"))
    for i in range(600):
        L = int(rng.randint(30, 400))
        aa = rng.randint(0, 20, L).astype(np.int8)
        ss = rng.randint(0, 20, L).astype(np.int8)
        t = np.arange(L) * 0.6
        ca = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * t], 1).astype(np.float32)
        w.add_entry(i, f"e{i}", f"e{i}", aa, ss, ca)
    db = w.finish()

    params = SearchParams()
    whole = UngappedPrefilter(db)
    assert len(whole.panels.splits) == 1
    budget = max(whole.panels.total_bytes // 4, 128 * 128 * 4)
    split = UngappedPrefilter(db, budget_bytes=budget)
    assert len(split.panels.splits) >= 3
    seqs = [np.asarray(db.get_ss(i)) for i in range(12)]
    a = whole.query_batch(seqs, params)
    b = split.query_batch(seqs, params)
    assert a == b
    assert any(len(h) > 3 for h in a)


def test_bucket_layout(exdb):
    """Buckets cover every entry exactly once, panels carry the sequences,
    and memory is bounded by bucket sums (not max_len * N)."""
    from foldseek_tpu.db.panels import build_buckets
    lens = exdb.lengths()
    seqs = [np.asarray(exdb.get_ss(i)) for i in range(exdb.size)]
    buckets = build_buckets(seqs, lens)
    seen = np.concatenate([b.entry_idx for b in buckets])
    assert sorted(seen.tolist()) == list(range(exdb.size))
    for b in buckets:
        for row, i in enumerate(b.entry_idx):
            L = int(lens[i])
            assert L <= b.lt_pad
            assert np.array_equal(b.panel_T[:L, row], seqs[i])
            assert (b.panel_T[L:, row] == 21).all()
    total = sum(b.nbytes for b in buckets)
    flat = int(lens.max() + 127) // 128 * 128 * (-(-exdb.size // 128) * 128) * 4
    assert total <= flat


def test_sw_pallas_matches_xla():
    """Pallas affine SW (interpret mode off-TPU) must reproduce the XLA
    scorer's score AND endpoint tie-breaking exactly."""
    import jax.numpy as jnp

    from foldseek_tpu.ops.sw import QueryProfile, sw_score_endpos
    from foldseek_tpu.ops.sw_pallas import pack_sw_profile, sw_scores_query
    rng = np.random.RandomState(7)
    Lq, B, Lt = 64, 128, 64
    prof = QueryProfile(rng.randint(0, 20, Lq).astype(np.int8),
                        rng.randint(0, 20, Lq).astype(np.int8))
    pa, ps = prof.padded(Lq)
    t_aa = rng.randint(0, 20, (B, Lt)).astype(np.int32)
    t_ss = rng.randint(0, 20, (B, Lt)).astype(np.int32)
    t_len = rng.randint(10, Lt + 1, B).astype(np.int32)
    for i in range(B):
        t_aa[i, t_len[i]:] = 21
        t_ss[i, t_len[i]:] = 21
    ref = [np.asarray(x) for x in sw_score_endpos(
        jnp.asarray(pa), jnp.asarray(ps), jnp.asarray(t_aa),
        jnp.asarray(t_ss), jnp.asarray(t_len))]
    got = [np.asarray(x) for x in sw_scores_query(
        jnp.asarray(pack_sw_profile(pa)), jnp.asarray(pack_sw_profile(ps)),
        jnp.asarray(t_aa.T), jnp.asarray(t_ss.T), jnp.asarray(t_len))]
    for r, g, name in zip(ref, got, ("score", "q_end", "t_end")):
        assert np.array_equal(r, g), name


def test_prefilter_mode3_direct_results(example_dir, tmp_path):
    """--prefilter-mode 3: alignment-format results straight from the gapped
    3Di prefilter pass, no alignment module (ungappedprefilter.cpp:274-291;
    GPU-only in the reference, so behavioral checks only)."""
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import easy_search
    lines = easy_search(str(example_dir / "1tim.pdb.gz"),
                        str(example_dir / "8tim.pdb.gz"),
                        str(tmp_path / "m3.m8"), str(tmp_path / "tmp"),
                        SearchParams(prefilter_mode=3))
    assert len(lines) == 4
    for l in lines:
        f = l.split("\t")
        assert int(f[6]) == 1 and int(f[8]) == 1  # qstart/tstart always 1
        assert int(f[11]) > 500                   # strong 3Di gapped scores
        assert float(f[10]) < 1e-10


def test_batched_lddt_device_matches_host():
    """Device-batched LDDT (round-2 groundwork) must match the per-hit
    host path."""
    from foldseek_tpu.ops import lddt as L
    rng = np.random.RandomState(9)
    P, M = 5, 64
    qa = np.zeros((P, M, 3), np.float32)
    ta = np.zeros((P, M, 3), np.float32)
    deg = np.zeros((P, M), np.float32)
    ml = rng.randint(20, M + 1, P).astype(np.int32)
    refs = []
    for p in range(P):
        n = ml[p]
        q = np.cumsum(rng.randn(n, 3) * 2, 0).astype(np.float32)
        t = (q + rng.randn(n, 3)).astype(np.float32)
        qa[p, :n] = q
        ta[p, :n] = t
        ctx = L.lddt_query_context(q)
        deg[p, :n] = ctx[1]
        refs.append(L.compute_lddt(q, t, 0, 0, "M" * n, q_ctx=ctx))
    avg, slen = L.batched_lddt_device(qa, ta, deg, ml, chunk=4)
    for p in range(P):
        assert abs(avg[p] - refs[p].avg_lddt) < 1e-5
        assert slen[p] == refs[p].score_length


def test_long_query_chained_blocks():
    """Queries too tall for one VMEM DP state run in row-block-chained
    launches; scores must equal the scalar reference (with byte cap)."""
    import jax.numpy as jnp

    from foldseek_tpu.ops.gapless_pallas import (LONG_QUERY_BLOCK,
                                                 gapless_scores_long,
                                                 pack_profile,
                                                 prepare_targets_T)
    rng = np.random.RandomState(5)
    m3 = mat3di(2.0, 0.0)
    Lq = 2 * LONG_QUERY_BLOCK + 517  # 3 blocks, ragged tail
    q_ss = rng.randint(0, 20, Lq)
    prof = m3.scores[:, q_ss].astype(np.float32)
    seqs = [rng.randint(0, 20, int(rng.randint(30, 120))).astype(np.int8)
            for _ in range(6)]
    t_T = prepare_targets_T(seqs, [len(s) for s in seqs])
    cap = 225.0
    got = np.asarray(gapless_scores_long(pack_profile(prof),
                                         jnp.asarray(t_T), cap))

    def capped_np(seq):
        h = np.zeros(Lq, dtype=np.int64)
        best = 0
        for cs in seq:
            s = m3.scores[cs][q_ss]
            diag = np.empty_like(h)
            diag[0] = 0
            diag[1:] = h[:-1]
            h = np.minimum(np.maximum(diag + s, 0), int(cap))
            best = max(best, int(h.max()))
        return best

    for i, seq in enumerate(seqs):
        assert int(got[i]) == capped_np(seq), i


def test_prefilter_long_query_integration(tmp_path):
    """A >3072-residue query routes through the long path and still returns
    reference-ordered hits."""
    from foldseek_tpu.db.storage import StructDBWriter
    rng = np.random.RandomState(6)
    w = StructDBWriter(str(tmp_path / "db"))
    for i in range(5):
        L = int(rng.randint(50, 200))
        w.add_entry(i, f"e{i}", f"e{i}", rng.randint(0, 20, L).astype(np.int8),
                    rng.randint(0, 20, L).astype(np.int8),
                    np.zeros((L, 3), np.float32))
    db = w.finish()
    pref = UngappedPrefilter(db)
    # long query containing target 2's sequence embedded in noise
    t2 = np.asarray(db.get_ss(2))
    q = rng.randint(0, 20, 4000).astype(np.int8)
    q[1000:1000 + len(t2)] = t2
    short = np.asarray(db.get_ss(1))
    hits_long, hits_short = pref.query_batch(
        [q, short], SearchParams())
    assert hits_long and hits_long[0][0] == 2  # embedded target is top hit
    assert hits_short[0][0] == 1
