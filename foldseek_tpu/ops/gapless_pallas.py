"""Pallas TPU kernel for the gapless diagonal prefilter.

Kadane-along-diagonals ungapped scoring, the reference's prefilter hot loop
(reference: lib/mmseqs/src/prefiltering/ungappedprefilter.cpp:338-474 CPU,
lib/mmseqs/lib/libmarv `Marv::scan` CUDA). The reference scores a SINGLE
alphabet (the 3Di seed matrix at bit scale 2.0 + query composition bias,
ungappedprefilter.cpp:533,185-193); a dual-alphabet (3Di+AA) variant is also
provided as a more sensitive TPU-only mode.

Layout (MXU-scored):
  * targets on LANES: one kernel instance scans a block of 256 targets
  * per column, letter scores come from the MXU: the target column is
    expanded to a one-hot [32, blk] bf16 mask via an iota compare and
    multiplied against the [Lq, 32] profile (dot_general, f32 accumulate).
    This moved scoring off the VPU — the lane-gather version saturated the
    VPU at ~290 GCUPS/chip; with the MXU doing scores and the VPU only the
    DP update (shift, add, max), the same chip measures ~467 GCUPS.
  * DP state h/best [Lq, blk] f32 lives in VMEM for the whole scan (an
    XLA-level scan round-trips it through HBM and is HBM-bound ~56-119)
  * targets arrive transposed [Lt, B] int32, padded positions = letter 21
    (profile lanes 21..31 hold a very negative pad score)
  * diagonal shift = sublane shift (concat)
  * the column loop is unrolled 32x inside fori_loop — Mosaic loses ~15%
    to loop overhead below 16 and regresses past 48
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # run in interpreter mode off-TPU (CPU test meshes)
    return jax.default_backend() != "tpu"


NEG = -3e8  # pad-letter score; finite to keep adds well-defined
PAD_LETTER = 21
PROF_LANES = 32  # letter axis padded to one MXU-friendly tile


def _pick_unroll(lt: int) -> int:
    for u in (32, 16, 8, 4, 2):
        if lt % u == 0:
            return u
    return 1


def _make_kernel_single(use_cap: bool, blk: int, unroll: int):
    def kernel(prof_ref, t_ref, cap_ref, out_ref):
        Lt = t_ref.shape[0]
        Lq = prof_ref.shape[0]
        prof = prof_ref[:].astype(jnp.bfloat16)
        # byte-saturation emulation: the reference's uint8 kernel clamps the
        # running score at 255 - bias (StripedSmithWaterman.cpp:1862-1866
        # with bias from ssw_init :1397-1406)
        cap = jnp.broadcast_to(cap_ref[pl.ds(0, 1), :], (Lq, blk)) if use_cap else None

        def one_col(j, h, best):
            tcol = t_ref[pl.ds(j, 1), :]
            iota = jax.lax.broadcasted_iota(jnp.int32, (PROF_LANES, blk), 0)
            oh = (iota == jnp.broadcast_to(tcol, (PROF_LANES, blk))).astype(jnp.bfloat16)
            s = jax.lax.dot_general(prof, oh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            diag = jnp.concatenate([jnp.zeros((1, blk), jnp.float32), h[:-1, :]], axis=0)
            h = jnp.maximum(diag + s, 0.0)
            if use_cap:
                h = jnp.minimum(h, cap)
            return h, jnp.maximum(best, h)

        def col_body(k, carry):
            h, best = carry
            for u in range(unroll):
                h, best = one_col(k * unroll + u, h, best)
            return h, best

        h0 = jnp.zeros((Lq, blk), dtype=jnp.float32)
        assert Lt % unroll == 0
        _, best = jax.lax.fori_loop(0, Lt // unroll, col_body, (h0, h0))
        out_ref[:] = jnp.max(best, axis=0, keepdims=True)
    return kernel


def _make_kernel_dual(blk: int, unroll: int):
    def kernel(paa_ref, pss_ref, taa_ref, tss_ref, out_ref):
        Lt = taa_ref.shape[0]
        Lq = paa_ref.shape[0]
        paa = paa_ref[:].astype(jnp.bfloat16)
        pss = pss_ref[:].astype(jnp.bfloat16)

        def one_col(j, h, best):
            iota = jax.lax.broadcasted_iota(jnp.int32, (PROF_LANES, blk), 0)
            oh_aa = (iota == jnp.broadcast_to(taa_ref[pl.ds(j, 1), :],
                                              (PROF_LANES, blk))).astype(jnp.bfloat16)
            oh_ss = (iota == jnp.broadcast_to(tss_ref[pl.ds(j, 1), :],
                                              (PROF_LANES, blk))).astype(jnp.bfloat16)
            s = (jax.lax.dot_general(paa, oh_aa, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(pss, oh_ss, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
            diag = jnp.concatenate([jnp.zeros((1, blk), jnp.float32), h[:-1, :]], axis=0)
            h = jnp.maximum(diag + s, 0.0)
            return h, jnp.maximum(best, h)

        def col_body(k, carry):
            h, best = carry
            for u in range(unroll):
                h, best = one_col(k * unroll + u, h, best)
            return h, best

        h0 = jnp.zeros((Lq, blk), dtype=jnp.float32)
        _, best = jax.lax.fori_loop(0, Lt // unroll, col_body, (h0, h0))
        out_ref[:] = jnp.max(best, axis=0, keepdims=True)
    return kernel


def _make_kernel_batch(use_cap: bool, blk: int, unroll: int, q: int,
                       lq_pad: int, int8_targets: bool = False):
    """Multi-query variant: q query profiles stacked on the sublane axis
    ([q*lq_pad, 32]), each slice ending in >=1 pad row (NEG profile score)
    so a diagonal cannot carry across query boundaries. Output [q, blk] is
    the per-query max. Same DP as the single-query kernel; measured ~570
    GCUPS/chip vs ~520 single (and one launch covers the whole query batch).

    int8_targets: the panel stays int8 in HBM/VMEM (4x capacity and
    bandwidth); the kernel loads one unroll-group of rows (32, the int8
    sublane tile) and upcasts in registers."""
    def kernel(prof_ref, t_ref, caps_ref, out_ref):
        Lt = t_ref.shape[0]
        QL = prof_ref.shape[0]
        prof = prof_ref[:].astype(jnp.bfloat16)
        caps = caps_ref[:] if use_cap else None  # [QL, 1] per-row cap

        def one_col(tcol, h, best):
            iota = jax.lax.broadcasted_iota(jnp.int32, (PROF_LANES, blk), 0)
            oh = (iota == jnp.broadcast_to(tcol, (PROF_LANES, blk))).astype(jnp.bfloat16)
            s = jax.lax.dot_general(prof, oh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            diag = jnp.concatenate([jnp.zeros((1, blk), jnp.float32), h[:-1, :]], axis=0)
            h = jnp.maximum(diag + s, 0.0)
            if use_cap:
                h = jnp.minimum(h, caps)
            return h, jnp.maximum(best, h)

        def col_body(k, carry):
            h, best = carry
            if int8_targets:
                # one aligned [unroll, blk] int8 load, upcast once
                tgrp = t_ref[pl.ds(k * unroll, unroll), :].astype(jnp.int32)
                for u in range(unroll):
                    h, best = one_col(tgrp[u:u + 1, :], h, best)
            else:
                for u in range(unroll):
                    h, best = one_col(t_ref[pl.ds(k * unroll + u, 1), :],
                                      h, best)
            return h, best

        h0 = jnp.zeros((QL, blk), dtype=jnp.float32)
        _, best = jax.lax.fori_loop(0, Lt // unroll, col_body, (h0, h0))
        out_ref[:] = jnp.max(best.reshape(q, lq_pad, blk), axis=1)
    return kernel


# DP-state budget (h + best, f32): the 16 MB scoped-VMEM limit fits the
# state plus the pipelined score transients up to q*lq_pad*blk*8 ~ 6.3 MB
# at unroll 32 (measured: 3072 rows x 256 lanes passes, 3528 overflows)
MAX_STATE_BYTES = 6_300_000


def max_query_rows(blk: int = 256) -> int:
    """Largest q*lq_pad the batch kernel can hold at the given block width."""
    return MAX_STATE_BYTES // (blk * 4 * 2)


@functools.partial(jax.jit, static_argnames=("q", "lq_pad", "use_cap"))
def gapless_scores_batch(prof_stack: jax.Array, t_T: jax.Array,
                         caps: jax.Array, q: int, lq_pad: int,
                         use_cap: bool = True) -> jax.Array:
    """Batched multi-query gapless scores.

    prof_stack: f32 [q*lq_pad, 32] stacked lane tables (pack_profiles_batch);
    t_T: int32 [Lt, B] transposed targets, pad letter 21; caps: f32
    [q*lq_pad, 1] per-row byte-saturation clamp. Returns f32 [q, B]."""
    Lt, B = t_T.shape
    assert prof_stack.shape[0] == q * lq_pad
    assert B % 128 == 0
    blk = _pick_blk(B)
    unroll = _pick_unroll(Lt)
    # trim unroll for tall stacks: deep software pipelines keep several
    # [QL, blk] f32 score buffers alive at once
    if q * lq_pad * blk * 8 > MAX_STATE_BYTES:
        unroll = min(unroll, 16)
    # int8 panels need 32-row-aligned group loads (the int8 sublane tile)
    int8_targets = t_T.dtype == jnp.int8 and unroll == 32
    out = pl.pallas_call(
        _make_kernel_batch(use_cap, blk, unroll, q, lq_pad,
                           int8_targets=int8_targets),
        interpret=_interpret(),
        grid=(B // blk,),
        in_specs=[
            pl.BlockSpec((q * lq_pad, PROF_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((q * lq_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, B), jnp.float32),
    )(prof_stack, t_T if int8_targets else t_T.astype(jnp.int32), caps)
    return out


# ---------------------------------------------------------------------------
# Long-query path: queries too tall for one VMEM-resident DP state
# (q*lq_pad rows > MAX_STATE_BYTES) are processed in row blocks chained
# through an HBM boundary buffer — block k's row 0 takes its diagonal
# predecessor from block k-1's last row at the previous column. This is
# the standard DP tiling; the reference handles the same lengths with its
# 65535 maxSeqLen on byte SIMD.

LONG_QUERY_BLOCK = 2048


def _make_kernel_long(use_cap: bool, blk: int, unroll: int, first: bool):
    def kernel(prof_ref, t_ref, cap_ref, bin_ref, out_ref, bout_ref):
        Lt = t_ref.shape[0]
        Lq = prof_ref.shape[0]
        prof = prof_ref[:].astype(jnp.bfloat16)
        cap = jnp.broadcast_to(cap_ref[pl.ds(0, 1), :], (Lq, blk)) if use_cap else None

        def one_col(j, h, best):
            tcol = t_ref[pl.ds(j, 1), :]
            iota = jax.lax.broadcasted_iota(jnp.int32, (PROF_LANES, blk), 0)
            oh = (iota == jnp.broadcast_to(tcol, (PROF_LANES, blk))).astype(jnp.bfloat16)
            s = jax.lax.dot_general(prof, oh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if first:
                top = jnp.zeros((1, blk), jnp.float32)
            else:
                # diagonal predecessor of row 0 = previous block's last row
                # at column j-1 (0 at the first column)
                jm = jnp.maximum(j - 1, 0)
                top = jnp.where(j > 0, bin_ref[pl.ds(jm, 1), :], 0.0)
            diag = jnp.concatenate([top, h[:-1, :]], axis=0)
            h = jnp.maximum(diag + s, 0.0)
            if use_cap:
                h = jnp.minimum(h, cap)
            bout_ref[pl.ds(j, 1), :] = h[Lq - 1:Lq, :]
            return h, jnp.maximum(best, h)

        def col_body(k, carry):
            h, best = carry
            for u in range(unroll):
                h, best = one_col(k * unroll + u, h, best)
            return h, best

        h0 = jnp.zeros((Lq, blk), dtype=jnp.float32)
        _, best = jax.lax.fori_loop(0, Lt // unroll, col_body, (h0, h0))
        out_ref[:] = jnp.max(best, axis=0, keepdims=True)
    return kernel


@functools.partial(jax.jit, static_argnames=("lq_block", "use_cap", "first"))
def _gapless_long_block(prof_block: jax.Array, t_T: jax.Array,
                        cap: jax.Array, boundary: jax.Array,
                        lq_block: int, use_cap: bool, first: bool):
    Lt, B = t_T.shape
    blk = _pick_blk(B)
    unroll = min(_pick_unroll(Lt), 16)
    cap_arr = jnp.broadcast_to(jnp.asarray(cap, jnp.float32), (1, blk))
    out, bout = pl.pallas_call(
        _make_kernel_long(use_cap, blk, unroll, first),
        interpret=_interpret(),
        grid=(B // blk,),
        in_specs=[
            pl.BlockSpec((lq_block, PROF_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.float32),
                   jax.ShapeDtypeStruct((Lt, B), jnp.float32)],
    )(prof_block, t_T.astype(jnp.int32), cap_arr, boundary)
    return out[0], bout


def gapless_scores_long(prof: np.ndarray, t_T, cap: float,
                        use_cap: bool = True):
    """Single-query gapless scores for queries of any length: the profile
    is processed in LONG_QUERY_BLOCK-row slabs, chaining the DP boundary
    row between launches. prof: f32 [Lq, 32] packed lane table (pack_profile)
    — rows beyond the real query must be NEG. Returns f32 [B]."""
    import jax

    Lq = prof.shape[0]
    Lt, B = t_T.shape
    n_blocks = -(-Lq // LONG_QUERY_BLOCK)
    pad_rows = n_blocks * LONG_QUERY_BLOCK - Lq
    if pad_rows:
        prof = np.concatenate(
            [prof, np.full((pad_rows, PROF_LANES), NEG, np.float32)], axis=0)
    t_dev = jnp.asarray(t_T)
    boundary = jnp.zeros((Lt, B), jnp.float32)
    best = None
    for k in range(n_blocks):
        block = jnp.asarray(
            prof[k * LONG_QUERY_BLOCK:(k + 1) * LONG_QUERY_BLOCK])
        out, boundary = _gapless_long_block(
            block, t_dev, jnp.float32(cap), boundary,
            LONG_QUERY_BLOCK, use_cap, k == 0)
        best = out if best is None else jnp.maximum(best, out)
    return best


@functools.partial(jax.jit, static_argnames=("q", "lq_pad", "k", "use_cap"))
def gapless_topk_batch(prof_stack: jax.Array, t_T: jax.Array,
                       caps: jax.Array, q: int, lq_pad: int, k: int,
                       use_cap: bool = True):
    """Fused scan + per-query top-k in ONE dispatch (scores stay on
    device; only [q, k] score/index pairs come home — on a remote-dispatch
    backend the full [q, B] readback dominates for large panels)."""
    scores = gapless_scores_batch(prof_stack, t_T, caps, q, lq_pad,
                                  use_cap=use_cap)
    return jax.lax.top_k(scores, k)


def pack_profiles_batch(profs, caps, lq_pad: int = None,
                        pad_score: float = NEG):
    """Stack per-query [21, Lq] profiles into the batch kernel's layout.

    profs: list of [21, Lq_i] float arrays; caps: per-query cap floats.
    Returns (prof_stack f32 [q*lq_pad, 32], caps f32 [q*lq_pad, 1], lq_pad).
    lq_pad is rounded so every query keeps >=1 trailing pad row (kills
    cross-query diagonal carry)."""
    q = len(profs)
    max_lq = max(p.shape[1] for p in profs)
    need = max(lq_pad or 0, max_lq + 1)
    lq_pad = -(-need // 8) * 8
    stack = np.full((q * lq_pad, PROF_LANES), pad_score, dtype=np.float32)
    cap_rows = np.full((q * lq_pad, 1), 3e8, dtype=np.float32)
    for k, p in enumerate(profs):
        Lq = p.shape[1]
        stack[k * lq_pad: k * lq_pad + Lq, :21] = p.T.astype(np.float32)
        cap_rows[k * lq_pad: (k + 1) * lq_pad, 0] = np.float32(caps[k])
    return stack, cap_rows, lq_pad


def pack_profile(prof: np.ndarray, pad_score: float = NEG) -> np.ndarray:
    """[21, Lq] int profile -> [Lq, 32] f32 lane table; lanes 21..31 = pad.
    Padded query rows should already be very negative in `prof`."""
    Lq = prof.shape[1]
    out = np.full((Lq, PROF_LANES), pad_score, dtype=np.float32)
    out[:, :21] = prof.T.astype(np.float32)
    return out


def _pick_blk(b: int) -> int:
    return 256 if b % 256 == 0 else 128


@functools.partial(jax.jit, static_argnames=("use_cap",))
def gapless_scores_single(prof: jax.Array, t_T: jax.Array,
                          cap: jax.Array = None, use_cap: bool = True) -> jax.Array:
    """Single-alphabet gapless scores (reference prefilter semantics).

    prof: f32 [Lq, 32] packed lane table; t_T: int32 [Lt, B] transposed
    targets with pad letter 21; cap: f32 scalar-ish [1, 1] running-score clamp
    (255 - byte bias; use_cap=False statically elides it). Returns f32 [B]."""
    Lt, B = t_T.shape
    Lq = prof.shape[0]
    assert B % 128 == 0
    if cap is None:
        cap = jnp.float32(3e8)
        use_cap = False
    blk = _pick_blk(B)
    cap_arr = jnp.broadcast_to(jnp.asarray(cap, jnp.float32), (1, blk))
    unroll = _pick_unroll(Lt)
    out = pl.pallas_call(
        _make_kernel_single(use_cap, blk, unroll),
        interpret=_interpret(),
        grid=(B // blk,),
        in_specs=[
            pl.BlockSpec((Lq, PROF_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
    )(prof, t_T.astype(jnp.int32), cap_arr)
    return out[0]


@jax.jit
def gapless_scores_dual(paa: jax.Array, pss: jax.Array,
                        t_aa_T: jax.Array, t_ss_T: jax.Array) -> jax.Array:
    """Dual-alphabet (3Di + AA) gapless scores — more sensitive TPU-only mode."""
    Lt, B = t_aa_T.shape
    assert B % 128 == 0
    blk = _pick_blk(B)
    unroll = _pick_unroll(Lt)
    out = pl.pallas_call(
        _make_kernel_dual(blk, unroll),
        interpret=_interpret(),
        grid=(B // blk,),
        in_specs=[
            pl.BlockSpec((paa.shape[0], PROF_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pss.shape[0], PROF_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
    )(paa, pss, t_aa_T.astype(jnp.int32), t_ss_T.astype(jnp.int32))
    return out[0]


def prepare_targets_T(seqs, lengths, lt_pad: int = None, b_pad: int = None):
    """Pack sequences into a transposed [Lt_pad, B_pad] int32 array with the
    pad letter in unused positions."""
    B = len(seqs)
    max_len = max((int(l) for l in lengths), default=1)
    lt_pad = lt_pad or max_len
    b_pad = b_pad or (-(-B // 128) * 128)
    t = np.full((b_pad, lt_pad), PAD_LETTER, dtype=np.int32)
    for i, seq in enumerate(seqs):
        L = min(int(lengths[i]), lt_pad)
        t[i, :L] = seq[:L]
    return np.ascontiguousarray(t.T)
