"""SW score/backtrace parity vs the reference alignment DB fixture, plus
JAX-kernel vs scalar-reference equivalence."""
import json

import numpy as np
import pytest

from foldseek_tpu.ops.matrices import encode_seq
from foldseek_tpu.ops.sw import QueryProfile, sw_score_endpos, sw_score_endpos_np
from foldseek_tpu.ops import backtrace as bt_ops
from foldseek_tpu.search.results import compress_backtrace


@pytest.fixture(scope="module")
def golden(golden_dir):
    with open(golden_dir / "example_3di.json") as f:
        seqs = json.load(f)
    with open(golden_dir / "aln_sb0.json") as f:
        alns = json.load(f)
    return seqs, alns


def test_sw_scores_and_backtrace_vs_golden(golden):
    seqs, alns = golden
    queries = list(alns)[:5]
    for q in queries:
        prof = QueryProfile(encode_seq(seqs[q]["aa"]), encode_seq(seqs[q]["ss"]))
        rprof = prof.reversed()
        for row in alns[q][:10]:
            t = row["target"]
            taa = encode_seq(seqs[t]["aa"])
            tss = encode_seq(seqs[t]["ss"])
            fwd, qe, te = sw_score_endpos_np(prof.prof_aa, prof.prof_ss, taa, tss)
            rev, _, _ = sw_score_endpos_np(rprof.prof_aa, rprof.prof_ss, taa, tss)
            assert fwd - rev == row["score"], (q, t)
            assert qe == row["qEnd"] and te == row["tEnd"], (q, t)
            tb = bt_ops.recover_alignment(prof, taa, tss, fwd, qe, te)
            assert tb.q_start == row["qStart"], (q, t)
            assert tb.t_start == row["tStart"], (q, t)
            assert compress_backtrace(tb.backtrace) == row["cigar"], (q, t)


def test_jax_kernel_matches_scalar(golden):
    seqs, _ = golden
    import jax.numpy as jnp

    names = list(seqs)[:6]
    q = names[0]
    prof = QueryProfile(encode_seq(seqs[q]["aa"]), encode_seq(seqs[q]["ss"]))
    lq_pad = 256
    pa, ps = prof.padded(lq_pad)
    lt_pad = 256
    B = len(names)
    t_aa = np.full((B, lt_pad), 20, dtype=np.int8)
    t_ss = np.full((B, lt_pad), 20, dtype=np.int8)
    t_len = np.zeros(B, dtype=np.int32)
    for i, n in enumerate(names):
        s_aa = encode_seq(seqs[n]["aa"])[:lt_pad]
        t_aa[i, : len(s_aa)] = s_aa
        s_ss = encode_seq(seqs[n]["ss"])[:lt_pad]
        t_ss[i, : len(s_ss)] = s_ss
        t_len[i] = len(s_aa)
    score, qend, tend = sw_score_endpos(
        jnp.asarray(pa), jnp.asarray(ps), jnp.asarray(t_aa), jnp.asarray(t_ss),
        jnp.asarray(t_len))
    for i, n in enumerate(names):
        s_aa = encode_seq(seqs[n]["aa"])[:lt_pad]
        s_ss = encode_seq(seqs[n]["ss"])[:lt_pad]
        s2, q2, t2 = sw_score_endpos_np(prof.prof_aa, prof.prof_ss, s_aa, s_ss)
        assert int(score[i]) == s2
        assert int(qend[i]) == q2
        assert int(tend[i]) == t2


def test_pairscorer_stacked_matches_xla(tmp_path):
    """The TPU stacked scorer (interpret mode here) and the very-long-query
    host fallback must reproduce the XLA reference scorer exactly."""
    import numpy as np

    from foldseek_tpu.db.storage import StructDBWriter
    from foldseek_tpu.search.align import PairScorer
    from foldseek_tpu.search.params import SearchParams

    rng = np.random.RandomState(4)
    w = StructDBWriter(str(tmp_path / "db"))
    lengths = [60, 2100, 50, 55, 48, 52]  # q0 short, q1 very long
    for i, L in enumerate(lengths):
        w.add_entry(i, f"e{i}", f"e{i}",
                    rng.randint(0, 20, L).astype(np.int8),
                    rng.randint(0, 20, L).astype(np.int8),
                    np.zeros((L, 3), np.float32))
    db = w.finish()
    params = SearchParams(add_backtrace=True)
    prefilter = {0: [2, 3, 4, 5], 1: [2, 3, 4, 5]}
    idx = db.key_to_index()

    ref = PairScorer(db, db, params, prefilter, idx, idx)  # CPU -> XLA path
    got = PairScorer(db, db, params, prefilter, idx, idx)
    got.per_query.clear()
    got._score_stacked(db, params,
                       {qk: list(tks) for qk, tks in prefilter.items()},
                       {tk: db.entry_len(idx[tk]) for tk in (2, 3, 4, 5)},
                       idx)
    assert set(got.per_query) == set(ref.per_query)
    for qk in ref.per_query:
        for a, b in zip(got.per_query[qk], ref.per_query[qk]):
            assert np.array_equal(a, b), qk


def test_batched_native_traceback_matches_per_hit(example_dir, tmp_path):
    """align.py _batch_tracebacks (one native batch_recover call) must
    reproduce the per-hit recover_alignment path record-for-record."""
    import foldseek_tpu.search.align as al
    from foldseek_tpu import native
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import search
    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    files = [str(f) for f in sorted(example_dir.iterdir())
             if "tim" not in f.name][:10]
    db = create_db(files, str(tmp_path / "db"))
    params = SearchParams(add_backtrace=True)
    batched = search(db, db, params)
    orig = al._batch_tracebacks
    al._batch_tracebacks = lambda *a, **k: {}
    try:
        per_hit = search(db, db, params)
    finally:
        al._batch_tracebacks = orig

    def fmt(res):
        return {k: [(r.db_key, r.score, r.q_start, r.t_start, r.backtrace,
                     r.identical, r.seq_id) for r in v]
                for k, v in res.items()}
    assert fmt(batched) == fmt(per_hit)


def test_sw_scores_batch_multi_matches_per_stack():
    """The multi-stack single-launch kernel must reproduce sw_scores_batch
    per stack exactly (same kernel body; only the grid gains a stack
    axis)."""
    import numpy as np

    from foldseek_tpu.ops.sw_pallas import (pack_sw_profiles_batch,
                                            sw_scores_batch,
                                            sw_scores_batch_multi)
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    q, lq_pad, Lt, B, S = 4, 64, 96, 128, 3
    paa_parts, pss_parts, ra_parts, rs_parts = [], [], [], []
    tA_parts, tS_parts, tl_parts = [], [], []
    refs = []
    for s in range(S):
        profs_aa, profs_ss = [], []
        for _ in range(q):
            L = rng.randint(20, lq_pad - 1)
            profs_aa.append(rng.randint(-8, 9, (21, L)).astype(np.float32))
            profs_ss.append(rng.randint(-8, 9, (21, L)).astype(np.float32))
        paa, pss, ra, rs_ = pack_sw_profiles_batch(profs_aa, profs_ss, lq_pad)
        t_aa = rng.randint(0, 20, (Lt, B)).astype(np.int32)
        t_ss = rng.randint(0, 20, (Lt, B)).astype(np.int32)
        t_len = rng.randint(10, Lt + 1, B).astype(np.int32)
        refs.append(sw_scores_batch(jnp.asarray(paa), jnp.asarray(pss),
                                    jnp.asarray(ra), jnp.asarray(rs_),
                                    jnp.asarray(t_aa), jnp.asarray(t_ss),
                                    jnp.asarray(t_len), q, lq_pad))
        paa_parts.append(paa); pss_parts.append(pss)
        ra_parts.append(ra); rs_parts.append(rs_)
        tA_parts.append(t_aa); tS_parts.append(t_ss); tl_parts.append(t_len)
    out = sw_scores_batch_multi(
        jnp.asarray(np.concatenate(paa_parts)),
        jnp.asarray(np.concatenate(pss_parts)),
        jnp.asarray(np.concatenate(ra_parts)),
        jnp.asarray(np.concatenate(rs_parts)),
        jnp.asarray(np.concatenate(tA_parts)),
        jnp.asarray(np.concatenate(tS_parts)),
        jnp.asarray(np.stack(tl_parts)), S, q, lq_pad)
    for s in range(S):
        for k in range(3):
            got = np.asarray(out[k])[s * q:(s + 1) * q]
            want = np.asarray(refs[s][k])
            assert np.array_equal(got, want), (s, k)
