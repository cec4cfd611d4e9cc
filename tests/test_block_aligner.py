"""Block-aligner backtrace path (native/block_aligner.hpp; the reference's
DEFAULT non-profile traceback, StructureSmithWaterman.cpp:369-527).

Every returned path is rescored exactly under the pipeline's affine-gap
semantics and must reproduce the forward SW score — this pins the trace
layout, the LUT walk, the start offsets, and the identity counts without
the Rust crate. The deeper A/B (brute-force DP + sanitizers) lives in
tools/native_tests/test_block_aligner.cpp; e2e byte parity vs the
reference binary rebuilt with the same core is covered by the golden
fixtures (tools/regen_goldens.sh) and tools/fuzz_parity.py."""
import numpy as np
import pytest

from foldseek_tpu import native
from foldseek_tpu.ops.sw import QueryProfile, sw_score_endpos_np
from foldseek_tpu.search.align import _block_mats


def _rescore(ops, q_start, t_start, prof, t_aa, t_ss):
    """Exact affine rescore of a forward-order backtrace; (score, ident)."""
    sc = 0
    qi, ti = q_start, t_start
    prev = ""
    ident = 0
    for c in ops:
        if c == "M":
            sc += int(prof.prof_aa[t_aa[ti], qi]) + int(prof.prof_ss[t_ss[ti], qi])
            ident += int(prof.q_aa[qi]) == int(t_aa[ti])
            qi += 1
            ti += 1
        elif c == "I":
            sc -= prof.gap_extend if prev == "I" else prof.gap_open
            qi += 1
        else:
            sc -= prof.gap_extend if prev == "D" else prof.gap_open
            ti += 1
        prev = c
    return sc, ident, qi, ti


@pytest.mark.skipif(native.get_lib() is None
                    or not hasattr(native.get_lib(), "batch_recover_block"),
                    reason="native lib without batch_recover_block")
def test_block_recover_paths_rescore_exact():
    rng = np.random.default_rng(42)
    n_checked = 0
    for case in range(12):
        Lq = int(rng.integers(30, 400))
        q_aa = rng.integers(0, 20, Lq).astype(np.int8)
        q_ss = rng.integers(0, 20, Lq).astype(np.int8)
        prof = QueryProfile(q_aa, q_ss)
        fprof = prof.flipped()
        lens = rng.integers(20, 500, 5)
        # correlated targets so real alignments with gaps exist
        t_list = []
        for L in lens:
            aa = rng.integers(0, 20, L).astype(np.int8)
            ss = rng.integers(0, 20, L).astype(np.int8)
            m = min(L, Lq)
            keep = rng.random(m) < 0.7
            aa[:m][keep] = q_aa[:m][keep]
            ss[:m][keep] = q_ss[:m][keep]
            t_list.append((aa, ss))
        db_aa = np.concatenate([t[0] for t in t_list])
        db_ss = np.concatenate([t[1] for t in t_list])
        offs = np.zeros(len(lens), np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        sc, qe, te = [], [], []
        for aa, ss in t_list:
            v = sw_score_endpos_np(*prof.padded(prof.L), aa.astype(np.int64),
                                   ss.astype(np.int64),
                                   gap_open=prof.gap_open,
                                   gap_extend=prof.gap_extend)
            sc.append(int(v[0]))
            qe.append(int(v[1]))
            te.append(int(v[2]))
        bias = fprof.bias_aa.astype(np.int16) + fprof.bias_ss.astype(np.int16)
        maa, mss = _block_mats(prof)
        out = native.batch_recover_block(
            fprof.q_aa, fprof.q_ss, bias, maa, mss, db_aa, db_ss,
            offs, np.array(te, np.int32), np.array(sc, np.int32),
            np.array(qe, np.int32), prof.gap_open, prof.gap_extend)
        assert out is not None
        q_start, t_start, ident, ops = out
        for i, (aa, ss) in enumerate(t_list):
            if sc[i] <= 0:
                continue
            assert ops[i] != "BLOCK_FAIL", (case, i, sc[i])
            got, got_ident, qi, ti = _rescore(
                ops[i], int(q_start[i]), int(t_start[i]), prof, aa, ss)
            assert got == sc[i], (case, i, got, sc[i])
            assert qi == qe[i] + 1 and ti == te[i] + 1
            assert got_ident == int(ident[i])
            n_checked += 1
    assert n_checked >= 30


@pytest.mark.skipif(native.get_lib() is None
                    or not hasattr(native.get_lib(), "batch_recover_block"),
                    reason="native lib without batch_recover_block")
def test_block_fail_sentinel_on_unreachable_score():
    """A target score no alignment can reach must return the BLOCK_FAIL
    sentinel (the reference's score1 = UINT32_MAX failure row)."""
    rng = np.random.default_rng(7)
    Lq = 80
    prof = QueryProfile(rng.integers(0, 20, Lq).astype(np.int8),
                        rng.integers(0, 20, Lq).astype(np.int8))
    fprof = prof.flipped()
    t_aa = rng.integers(0, 20, 90).astype(np.int8)
    t_ss = rng.integers(0, 20, 90).astype(np.int8)
    bias = fprof.bias_aa.astype(np.int16) + fprof.bias_ss.astype(np.int16)
    maa, mss = _block_mats(prof)
    out = native.batch_recover_block(
        fprof.q_aa, fprof.q_ss, bias, maa, mss, t_aa, t_ss,
        np.zeros(1, np.int64), np.array([89], np.int32),
        np.array([30000], np.int32), np.array([79], np.int32),
        prof.gap_open, prof.gap_extend)
    assert out[3][0] == "BLOCK_FAIL"
