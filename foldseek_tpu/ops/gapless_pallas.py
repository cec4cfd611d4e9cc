"""Pallas TPU kernel for the gapless diagonal prefilter.

Kadane-along-diagonals ungapped scoring, the reference's prefilter hot loop
(reference: lib/mmseqs/src/prefiltering/ungappedprefilter.cpp:338-474 CPU,
lib/mmseqs/lib/libmarv `Marv::scan` CUDA). The reference scores a SINGLE
alphabet (the 3Di seed matrix at bit scale 2.0 + query composition bias,
ungappedprefilter.cpp:533,185-193); a dual-alphabet (3Di+AA) variant is also
provided as a more sensitive TPU-only mode.

Layout (chosen around Mosaic's lane-gather support: take_along_axis along
lanes works within one 128-lane vreg):
  * targets on LANES: one kernel instance scans 128 targets
  * query positions on SUBLANES: DP state h/best [Lq, 128] f32 lives in VMEM
    for the whole scan (the XLA version round-trips it through HBM and is
    HBM-bound at ~56 GCUPS; this kernel measures ~134-180 GCUPS/chip)
  * profile as [Lq, 128] lane table (lanes 0..20 = letter scores, lane 21 =
    very negative pad letter), so a column's scores are one lane-gather
  * targets arrive transposed [Lt, B] int32, padded positions = letter 21
  * diagonal shift = sublane shift (concat)
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


def _make_kernel_single(use_cap: bool, unroll: int = 4):
    def kernel(prof_ref, t_ref, cap_ref, out_ref):
        Lt = t_ref.shape[0]
        Lq = prof_ref.shape[0]
        B = 128
        # byte-saturation emulation: the reference's uint8 kernel clamps the
        # running score at 255 - bias (StripedSmithWaterman.cpp:1862-1866
        # with bias from ssw_init :1397-1406)
        cap = jnp.broadcast_to(cap_ref[pl.ds(0, 1), :], (Lq, B)) if use_cap else None

        def one_col(j, h, best):
            idx = jnp.broadcast_to(t_ref[pl.ds(j, 1), :], (Lq, B))
            s = jnp.take_along_axis(prof_ref[:], idx, axis=1)
            diag = jnp.concatenate([jnp.zeros((1, B), jnp.float32), h[:-1, :]], axis=0)
            h = jnp.maximum(diag + s, 0.0)
            if use_cap:
                h = jnp.minimum(h, cap)
            return h, jnp.maximum(best, h)

        def col_body(k, carry):
            h, best = carry
            for u in range(unroll):
                h, best = one_col(k * unroll + u, h, best)
            return h, best

        h0 = jnp.zeros((Lq, B), dtype=jnp.float32)
        assert Lt % unroll == 0
        _, best = jax.lax.fori_loop(0, Lt // unroll, col_body, (h0, h0))
        out_ref[:] = jnp.max(best, axis=0, keepdims=True)
    return kernel


def _kernel_dual(paa_ref, pss_ref, taa_ref, tss_ref, out_ref):
    Lt = taa_ref.shape[0]
    Lq = paa_ref.shape[0]
    B = 128

    def col_body(j, carry):
        h, best = carry
        idx_aa = jnp.broadcast_to(taa_ref[pl.ds(j, 1), :], (Lq, B))
        idx_ss = jnp.broadcast_to(tss_ref[pl.ds(j, 1), :], (Lq, B))
        s = (jnp.take_along_axis(paa_ref[:], idx_aa, axis=1)
             + jnp.take_along_axis(pss_ref[:], idx_ss, axis=1))
        diag = jnp.concatenate([jnp.zeros((1, B), jnp.float32), h[:-1, :]], axis=0)
        h = jnp.maximum(diag + s, 0.0)
        best = jnp.maximum(best, h)
        return h, best

    h0 = jnp.zeros((Lq, B), dtype=jnp.float32)
    _, best = jax.lax.fori_loop(0, Lt, col_body, (h0, h0))
    out_ref[:] = jnp.max(best, axis=0, keepdims=True)


def pack_profile(prof: np.ndarray, pad_score: float = NEG) -> np.ndarray:
    """[21, Lq] int profile -> [Lq, 128] f32 lane table; lane 21 = pad letter.
    Padded query rows should already be very negative in `prof`."""
    Lq = prof.shape[1]
    out = np.zeros((Lq, 128), dtype=np.float32)
    out[:, :21] = prof.T.astype(np.float32)
    out[:, PAD_LETTER] = pad_score
    return out


@functools.partial(jax.jit, static_argnames=("use_cap",))
def gapless_scores_single(prof: jax.Array, t_T: jax.Array,
                          cap: jax.Array = None, use_cap: bool = True) -> jax.Array:
    """Single-alphabet gapless scores (reference prefilter semantics).

    prof: f32 [Lq, 128] packed lane table; t_T: int32 [Lt, B] transposed
    targets with pad letter 21; cap: f32 scalar-ish [1, 1] running-score clamp
    (255 - byte bias; use_cap=False statically elides it). Returns f32 [B]."""
    Lt, B = t_T.shape
    Lq = prof.shape[0]
    assert B % 128 == 0
    if cap is None:
        cap = jnp.float32(3e8)
        use_cap = False
    cap_arr = jnp.broadcast_to(jnp.asarray(cap, jnp.float32), (1, 128))
    unroll = 4 if Lt % 4 == 0 else (2 if Lt % 2 == 0 else 1)
    out = pl.pallas_call(
        _make_kernel_single(use_cap, unroll),
        interpret=_interpret(),
        grid=(B // 128,),
        in_specs=[
            pl.BlockSpec((Lq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
    )(prof, t_T.astype(jnp.int32), cap_arr)
    return out[0]


@jax.jit
def gapless_scores_dual(paa: jax.Array, pss: jax.Array,
                        t_aa_T: jax.Array, t_ss_T: jax.Array) -> jax.Array:
    """Dual-alphabet (3Di + AA) gapless scores — more sensitive TPU-only mode."""
    Lt, B = t_aa_T.shape
    Lq = paa.shape[0]
    assert B % 128 == 0
    out = pl.pallas_call(
        _kernel_dual,
        interpret=_interpret(),
        grid=(B // 128,),
        in_specs=[
            pl.BlockSpec((Lq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
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
