"""Pallas TPU kernel for dual-alphabet affine-gap Smith-Waterman scoring.

Replaces the XLA `lax.scan` score+endpoint pass of `ops/sw.py` for the
common case where many candidate targets share one query profile — the
reference's per-query hit loop (reference:
src/strucclustutils/structurealign.cpp:318 over StructureSmithWaterman's
sw_sse2_byte/word, StructureSmithWaterman.cpp:1790-1900). The XLA version
round-trips the [B, Lq] H/E state through HBM every target column and
measures <1 GCUPS/chip; holding the state in VMEM and scoring on the MXU
reaches ~97 GCUPS/chip, and the multi-query stacked variant below shares
one launch across a whole query batch.

Layout (same scheme as gapless_pallas):
  * targets on LANES (blocks of 128), query positions on SUBLANES
  * per-column letter scores from the MXU: one-hot compare of the target
    column against iota, then [Lq, 32] x [32, B] dot for each alphabet
  * affine gaps with the reference's semantics:
      - E (gap in target) opens from h BEFORE F is applied (lazy-F
        "disallow adjacent insertion and then deletion",
        StructureSmithWaterman.cpp:1230)
      - F (gap in query) resolved with a log-step prefix max along the
        query axis: F[i] = max_{k<i}(h_noF[k] + k*ge) - (i-1)*ge - go
  * endpoint tie rules mirrored from the reference: best target end =
    first column strictly improving the max (:1272-1277), best query end
    = smallest query index attaining the column max (:1052-1059)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gapless_pallas import PROF_LANES, _interpret, _pick_blk

NEG = -1e9


def _make_sw_kernel(blk: int, lq: int, go: float, ge: float, unroll: int):
    n_scan = max(1, int(np.ceil(np.log2(max(lq, 2)))))

    def kernel(paa_ref, pss_ref, taa_ref, tss_ref, tlen_ref,
               score_ref, qend_ref, tend_ref):
        Lt = taa_ref.shape[0]
        paa = paa_ref[:].astype(jnp.bfloat16)
        pss = pss_ref[:].astype(jnp.bfloat16)
        tlen = tlen_ref[pl.ds(0, 1), :]                       # [1, blk]
        qp = jax.lax.broadcasted_iota(jnp.int32, (lq, blk), 0).astype(jnp.float32)
        iota32 = jax.lax.broadcasted_iota(jnp.int32, (PROF_LANES, blk), 0)

        def one_col(j, H, E, best, bj, bq):
            oh_aa = (iota32 == jnp.broadcast_to(taa_ref[pl.ds(j, 1), :],
                                                (PROF_LANES, blk))).astype(jnp.bfloat16)
            oh_ss = (iota32 == jnp.broadcast_to(tss_ref[pl.ds(j, 1), :],
                                                (PROF_LANES, blk))).astype(jnp.bfloat16)
            s = (jax.lax.dot_general(paa, oh_aa, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(pss, oh_ss, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
            diag = jnp.concatenate([jnp.zeros((1, blk), jnp.float32), H[:-1, :]], axis=0)
            h_noF = jnp.maximum(jnp.maximum(diag + s, E), 0.0)
            # F via prefix max of g = h_noF + qpos*ge (exclusive)
            g = h_noF + qp * ge
            pm = g
            for k in range(n_scan):
                off = 1 << k
                if off >= lq:
                    break
                shifted = jnp.concatenate(
                    [jnp.full((off, blk), jnp.float32(NEG)), pm[:-off, :]], axis=0)
                pm = jnp.maximum(pm, shifted)
            pm_excl = jnp.concatenate(
                [jnp.full((1, blk), jnp.float32(NEG)), pm[:-1, :]], axis=0)
            F = pm_excl - (qp - 1.0) * ge - go
            H_new = jnp.maximum(h_noF, F)
            E_new = jnp.maximum(E - ge, h_noF - go)
            col_max = jnp.max(H_new, axis=0, keepdims=True)   # [1, blk]
            valid = (jnp.float32(j) < tlen)
            col_max = jnp.where(valid, col_max, jnp.float32(-1.0))
            improved = col_max > best
            # smallest query index attaining the column max
            qe = jnp.min(jnp.where(H_new >= col_max, qp, jnp.float32(lq)),
                         axis=0, keepdims=True)
            best = jnp.where(improved, col_max, best)
            bj = jnp.where(improved, jnp.float32(j), bj)
            bq = jnp.where(improved, qe, bq)
            return H_new, E_new, best, bj, bq

        def body(k, carry):
            H, E, best, bj, bq = carry
            for u in range(unroll):
                H, E, best, bj, bq = one_col(k * unroll + u, H, E, best, bj, bq)
            return H, E, best, bj, bq

        H0 = jnp.zeros((lq, blk), jnp.float32)
        E0 = jnp.full((lq, blk), jnp.float32(NEG))
        z = jnp.zeros((1, blk), jnp.float32)
        _, _, best, bj, bq = jax.lax.fori_loop(
            0, Lt // unroll, body, (H0, E0, z, z, jnp.full((1, blk), lq - 1.0)))
        score_ref[:] = best
        tend_ref[:] = bj
        qend_ref[:] = bq
    return kernel


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend"))
def sw_scores_query(paa: jax.Array, pss: jax.Array,
                    t_aa_T: jax.Array, t_ss_T: jax.Array, t_len: jax.Array,
                    gap_open: int = 10, gap_extend: int = 1):
    """Affine SW scores of ONE query profile against B targets.

    paa/pss: f32 [Lq, 32] lane tables (pad letters very negative);
    t_aa_T/t_ss_T: int32 [Lt, B] transposed targets (pad letter 21);
    t_len: int32 [B]. Returns (score, q_end, t_end) int32 [B]."""
    Lt, B = t_aa_T.shape
    Lq = paa.shape[0]
    assert B % 128 == 0
    blk = _pick_blk(B)
    unroll = 8 if Lt % 8 == 0 else (4 if Lt % 4 == 0 else (2 if Lt % 2 == 0 else 1))
    tl = jnp.broadcast_to(t_len.astype(jnp.float32)[None, :], (1, B))
    out_shapes = [jax.ShapeDtypeStruct((1, B), jnp.float32)] * 3
    score, qend, tend = pl.pallas_call(
        _make_sw_kernel(blk, Lq, float(gap_open), float(gap_extend), unroll),
        interpret=_interpret(),
        grid=(B // blk,),
        in_specs=[
            pl.BlockSpec((Lq, PROF_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lq, PROF_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shapes,
    )(paa, pss, t_aa_T.astype(jnp.int32), t_ss_T.astype(jnp.int32), tl)
    return (score[0].astype(jnp.int32), qend[0].astype(jnp.int32),
            tend[0].astype(jnp.int32))


def pack_sw_profile(prof: np.ndarray, pad_score: float = -1e9) -> np.ndarray:
    """[21, Lq] int profile -> [Lq, 32] f32; lanes 21..31 very negative."""
    Lq = prof.shape[1]
    out = np.full((Lq, PROF_LANES), np.float32(pad_score), dtype=np.float32)
    out[:, :21] = prof.T.astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# Multi-query stacked variant: q (profile, reversed-profile, ...) stacks on
# the sublane axis share one target panel. The affine F recurrence (prefix
# max along the query axis) is segmented across query boundaries with a
# per-query "staircase" bias folded into the two per-row constants the
# single-query kernel already applies — zero extra per-cell work:
#   g = h_noF + qp*ge + qidx*BIG      (h_noF >= 0, so every row of query k
#                                      carries bias >= k*BIG)
#   F = pm_excl - ((qp-1)*ge + go + qidx*BIG [+ 1e9 on pad rows])
# Cross-query prefix-max entries keep a smaller bias, so they can never win
# inside a later query (BIG exceeds any reachable score), and the pad-row
# term keeps H at 0 on the boundary rows — the clean H[-1]=0 start the
# single-query kernel has.
# ---------------------------------------------------------------------------

SEG_BIG = 65536.0  # > any reachable SW score + qp*ge term; exact in f32


def _make_sw_batch_kernel(blk: int, q: int, lqp: int, go: float, ge: float,
                          unroll: int):
    n_scan = max(1, int(np.ceil(np.log2(max(lqp, 2)))))

    def kernel(paa_ref, pss_ref, rowadd_ref, rowsub_ref, taa_ref, tss_ref,
               tlen_ref, score_ref, qend_ref, tend_ref):
        Lt = taa_ref.shape[0]
        QL = q * lqp
        paa = paa_ref[:].astype(jnp.bfloat16)
        pss = pss_ref[:].astype(jnp.bfloat16)
        rowadd = rowadd_ref[:]                                # [QL, 1]
        rowsub = rowsub_ref[:]                                # [QL, 1]
        tlen = tlen_ref[pl.ds(0, 1), :]                       # [1, blk]
        qp_rel = (jax.lax.broadcasted_iota(jnp.int32, (q, lqp, blk), 1)
                  .reshape(QL, blk).astype(jnp.float32))
        iota32 = jax.lax.broadcasted_iota(jnp.int32, (PROF_LANES, blk), 0)

        def one_col(j, H, E, best, bj, bq):
            oh_aa = (iota32 == jnp.broadcast_to(taa_ref[pl.ds(j, 1), :],
                                                (PROF_LANES, blk))).astype(jnp.bfloat16)
            oh_ss = (iota32 == jnp.broadcast_to(tss_ref[pl.ds(j, 1), :],
                                                (PROF_LANES, blk))).astype(jnp.bfloat16)
            s = (jax.lax.dot_general(paa, oh_aa, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(pss, oh_ss, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
            diag = jnp.concatenate([jnp.zeros((1, blk), jnp.float32), H[:-1, :]], axis=0)
            h_noF = jnp.maximum(jnp.maximum(diag + s, E), 0.0)
            g = h_noF + rowadd
            pm = g
            for k in range(n_scan):
                off = 1 << k
                if off >= lqp:
                    break
                shifted = jnp.concatenate(
                    [jnp.full((off, blk), jnp.float32(NEG)), pm[:-off, :]], axis=0)
                pm = jnp.maximum(pm, shifted)
            pm_excl = jnp.concatenate(
                [jnp.full((1, blk), jnp.float32(NEG)), pm[:-1, :]], axis=0)
            F = pm_excl - rowsub
            H_new = jnp.maximum(h_noF, F)
            E_new = jnp.maximum(E - ge, h_noF - go)
            Hq = H_new.reshape(q, lqp, blk)
            col_max = jnp.max(Hq, axis=1)                      # [q, blk]
            valid = jnp.float32(j) < jnp.broadcast_to(tlen, (q, blk))
            col_max = jnp.where(valid, col_max, jnp.float32(-1.0))
            improved = col_max > best
            qe = jnp.min(
                jnp.where(H_new >= jnp.broadcast_to(col_max[:, None, :],
                                                    (q, lqp, blk)).reshape(QL, blk),
                          qp_rel, jnp.float32(lqp)).reshape(q, lqp, blk),
                axis=1)                                        # [q, blk]
            best = jnp.where(improved, col_max, best)
            bj = jnp.where(improved, jnp.float32(j), bj)
            bq = jnp.where(improved, qe, bq)
            return H_new, E_new, best, bj, bq

        def body(k, carry):
            H, E, best, bj, bq = carry
            for u in range(unroll):
                H, E, best, bj, bq = one_col(k * unroll + u, H, E, best, bj, bq)
            return H, E, best, bj, bq

        H0 = jnp.zeros((QL, blk), jnp.float32)
        E0 = jnp.full((QL, blk), jnp.float32(NEG))
        z = jnp.zeros((q, blk), jnp.float32)
        _, _, best, bj, bq = jax.lax.fori_loop(
            0, Lt // unroll, body, (H0, E0, z, z, jnp.full((q, blk), lqp - 1.0)))
        # pl.ds write: the multi-stack variant pads output blocks to a
        # multiple of 8 rows (TPU block-shape rule); rows q.. stay unwritten
        # and are sliced off by the wrapper.
        score_ref[pl.ds(0, q), :] = best
        tend_ref[pl.ds(0, q), :] = bj
        qend_ref[pl.ds(0, q), :] = bq
    return kernel


# stacked SW DP state budget (H + E f32 + pm-chain transients;
# measured: 2048 rows x 128 lanes overflows the 16 MB scoped limit)
SW_MAX_STACK_ROWS = 1536


@functools.partial(jax.jit, static_argnames=("q", "lq_pad", "gap_open",
                                             "gap_extend"))
def sw_scores_batch(paa_stack: jax.Array, pss_stack: jax.Array,
                    rowadd: jax.Array, rowsub: jax.Array,
                    t_aa_T: jax.Array, t_ss_T: jax.Array, t_len: jax.Array,
                    q: int, lq_pad: int,
                    gap_open: int = 10, gap_extend: int = 1):
    """Affine SW scores of q stacked query profiles against B shared targets.

    paa_stack/pss_stack/rowadd/rowsub: from pack_sw_profiles_batch;
    t_*: int32 [Lt, B]; t_len: int32 [B].
    Returns (score, q_end, t_end) int32 [q, B] — identical per query to
    sw_scores_query at the same lq_pad."""
    Lt, B = t_aa_T.shape
    assert paa_stack.shape[0] == q * lq_pad
    assert B % 128 == 0
    blk = 128
    unroll = 8 if Lt % 8 == 0 else (4 if Lt % 4 == 0 else (2 if Lt % 2 == 0 else 1))
    tl = jnp.broadcast_to(t_len.astype(jnp.float32)[None, :], (1, B))
    out_shapes = [jax.ShapeDtypeStruct((q, B), jnp.float32)] * 3
    score, qend, tend = pl.pallas_call(
        _make_sw_batch_kernel(blk, q, lq_pad, float(gap_open),
                              float(gap_extend), unroll),
        interpret=_interpret(),
        grid=(B // blk,),
        in_specs=[
            pl.BlockSpec((q * lq_pad, PROF_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q * lq_pad, PROF_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q * lq_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q * lq_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((q, blk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shapes,
    )(paa_stack, pss_stack, rowadd, rowsub,
      t_aa_T.astype(jnp.int32), t_ss_T.astype(jnp.int32), tl)
    return (score.astype(jnp.int32), qend.astype(jnp.int32),
            tend.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_stacks", "q", "lq_pad",
                                             "gap_open", "gap_extend"))
def sw_scores_batch_multi(paa_all: jax.Array, pss_all: jax.Array,
                          rowadd_all: jax.Array, rowsub_all: jax.Array,
                          t_aa_T_all: jax.Array, t_ss_T_all: jax.Array,
                          t_len_all: jax.Array,
                          n_stacks: int, q: int, lq_pad: int,
                          gap_open: int = 10, gap_extend: int = 1):
    """Multi-stack variant: ONE launch scores `n_stacks` independent
    profile stacks, each against its own B-target panel — the stack axis
    folds into the leading dimension of every operand and becomes the
    outer grid axis, so the kernel body is byte-for-byte the single-stack
    one. Built for many-query-few-candidate workloads (the cluster
    cascade ran ~4000 per-stack launches; per-launch overhead on a
    remote backend was ~100 s of a 350 s easy-cluster).

    paa_all/pss_all: [n_stacks * q * lq_pad, 32]; rowadd/rowsub:
    [n_stacks * q * lq_pad, 1]; t_*_all: [n_stacks * Lt, B];
    t_len_all: [n_stacks, B]. Returns (score, q_end, t_end) int32
    [n_stacks * q, B], identical per stack to sw_scores_batch."""
    rows = q * lq_pad
    SLt, B = t_aa_T_all.shape
    Lt = SLt // n_stacks
    assert paa_all.shape[0] == n_stacks * rows
    assert B % 128 == 0
    blk = 128
    unroll = 8 if Lt % 8 == 0 else (4 if Lt % 4 == 0 else (2 if Lt % 2 == 0 else 1))
    # TPU block-shape rule: the last two dims of every block must be
    # divisible by (8, 128) or equal the array dims. With the stack axis
    # folded into the leading dim, "equal" is off the table, so (a) t_len
    # is replicated to 8 identical rows per stack (the kernel reads row 0
    # via pl.ds(0, 1)) and (b) output blocks are padded to q8 rows; the
    # kernel writes rows [0, q) and the pad rows are sliced away here.
    q8 = -(-q // 8) * 8
    tl = jnp.broadcast_to(
        t_len_all.astype(jnp.float32).reshape(n_stacks, 1, B),
        (n_stacks, 8, B)).reshape(n_stacks * 8, B)
    out_shapes = [jax.ShapeDtypeStruct((n_stacks * q8, B), jnp.float32)] * 3
    score, qend, tend = pl.pallas_call(
        _make_sw_batch_kernel(blk, q, lq_pad, float(gap_open),
                              float(gap_extend), unroll),
        interpret=_interpret(),
        grid=(n_stacks, B // blk),
        in_specs=[
            pl.BlockSpec((rows, PROF_LANES), lambda s, i: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, PROF_LANES), lambda s, i: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda s, i: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda s, i: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda s, i: (s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda s, i: (s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk), lambda s, i: (s, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((q8, blk), lambda s, i: (s, i),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shapes,
        # the stack axis makes every input block grid-varying, so Pallas
        # double-buffers the 192 KB profile blocks too — at the full
        # SW_MAX_STACK_ROWS the working set lands ~0.1 MB over the 16 MB
        # default scoped-VMEM budget; raise it (v5e has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(paa_all, pss_all, rowadd_all, rowsub_all,
      t_aa_T_all.astype(jnp.int32), t_ss_T_all.astype(jnp.int32), tl)
    if q8 != q:
        score = score.reshape(n_stacks, q8, B)[:, :q, :].reshape(n_stacks * q, B)
        qend = qend.reshape(n_stacks, q8, B)[:, :q, :].reshape(n_stacks * q, B)
        tend = tend.reshape(n_stacks, q8, B)[:, :q, :].reshape(n_stacks * q, B)
    return (score.astype(jnp.int32), qend.astype(jnp.int32),
            tend.astype(jnp.int32))


def pack_sw_profiles_batch(profs_aa, profs_ss, lq_pad: int,
                           gap_open: int = 10, gap_extend: int = 1,
                           pad_score: float = -1e9):
    """Stack per-query ([21, Lq] aa, [21, Lq] ss) profile pairs into the
    batched kernel's [q*lq_pad, 32] layout plus the segmented-F row
    constants. Every query keeps >=1 trailing all-NEG pad row (lq_pad must
    exceed the longest Lq). Returns (paa, pss, rowadd, rowsub) f32."""
    q = len(profs_aa)
    assert all(p.shape[1] < lq_pad for p in profs_aa)
    paa = np.full((q * lq_pad, PROF_LANES), np.float32(pad_score), np.float32)
    pss = np.full((q * lq_pad, PROF_LANES), np.float32(pad_score), np.float32)
    pad_rows = np.ones(q * lq_pad, dtype=bool)
    for k in range(q):
        Lq = profs_aa[k].shape[1]
        paa[k * lq_pad: k * lq_pad + Lq, :21] = profs_aa[k].T
        pss[k * lq_pad: k * lq_pad + Lq, :21] = profs_ss[k].T
        pad_rows[k * lq_pad: k * lq_pad + Lq] = False
    qp = np.arange(q * lq_pad) % lq_pad
    qidx = np.arange(q * lq_pad) // lq_pad
    rowadd = (qp * gap_extend + qidx * SEG_BIG).astype(np.float32)[:, None]
    rowsub = ((qp - 1) * gap_extend + gap_open + qidx * SEG_BIG
              + np.where(pad_rows, 1e9, 0.0)).astype(np.float32)[:, None]
    return paa, pss, rowadd, rowsub
