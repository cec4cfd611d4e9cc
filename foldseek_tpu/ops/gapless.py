"""Gapless (ungapped) diagonal scoring — the TPU prefilter workhorse.

The reference's exhaustive ungapped prefilter scores every query/target pair
with the best local ungapped diagonal (reference:
lib/mmseqs/src/prefiltering/ungappedprefilter.cpp:338-474 CPU,
lib/mmseqs/lib/libmarv CUDA `Marv::scan`; foldseek forces this mode on GPU,
src/workflow/StructureSearch.cpp:110-112). Recurrence per cell (Kadane along
diagonals):  h[i][j] = max(0, h[i-1][j-1] + S(q_i, t_j)),  score = max h.

TPU-native formulation: the per-column score vectors for a batch of targets
are produced on the MXU as one-hot(target chunk over both alphabets, 42
classes) x profile matmul (bf16 in, f32 out), then a short on-chip scan
applies the max/add recurrence column by column with a lane shift. FLOP
overhead vs the pure DP is 2x42, but MXU throughput makes the matmul cheap
relative to the VPU recurrence. State: h [B, Lq] f32; scan over target length.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


def combine_profiles(prof_aa: np.ndarray, prof_ss: np.ndarray) -> np.ndarray:
    """Stack the two [21, Lq] profiles into one [42, Lq] table indexed by
    (aa letter, 21 + ss letter)."""
    return np.concatenate([prof_aa, prof_ss], axis=0).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("chunk",))
def gapless_scores(prof2: jax.Array, t_aa: jax.Array, t_ss: jax.Array,
                   t_len: jax.Array, chunk: int = 32):
    """Best ungapped diagonal score of one query vs padded targets.

    Args:
      prof2: f32 [42, Lq] stacked AA+3Di profile (combine_profiles); padded
        query columns must be very negative.
      t_aa, t_ss: int8/int32 [B, Lt] numeric targets (pad masked by t_len).
      t_len: int32 [B].
    Returns:
      scores f32 [B]; q_end, t_end int32 [B] (first maximal target column,
      smallest query index within it — reference tie-breaking).
    """
    B, Lt = t_aa.shape
    Lq = prof2.shape[1]
    n_chunks = Lt // chunk
    assert n_chunks * chunk == Lt, "Lt must be a multiple of chunk"
    prof_bf = prof2.astype(jnp.bfloat16)
    oh_aa = jax.nn.one_hot(t_aa.astype(jnp.int32), 21, dtype=jnp.bfloat16)
    oh_ss = jax.nn.one_hot(t_ss.astype(jnp.int32), 21, dtype=jnp.bfloat16)
    t_onehot = jnp.concatenate([oh_aa, oh_ss], axis=-1)  # [B, Lt, 42]

    def step(carry, inputs):
        h, best, best_j, best_qend = carry
        s_chunk, j0 = inputs  # [B, chunk, Lq], scalar

        def inner(k, state):
            h, best, best_j, best_qend = state
            s = s_chunk[:, k, :]
            diag = jnp.pad(h[:, :-1], ((0, 0), (1, 0)))
            h = jnp.maximum(diag + s, 0.0)
            j = j0 + k
            valid = j < t_len
            col_max = jnp.where(valid, jnp.max(h, axis=1), NEG)
            improved = col_max > best
            qend = jnp.argmax(h == col_max[:, None], axis=1).astype(jnp.int32)
            best = jnp.where(improved, col_max, best)
            best_j = jnp.where(improved, j, best_j)
            best_qend = jnp.where(improved, qend, best_qend)
            return h, best, best_j, best_qend

        h, best, best_j, best_qend = jax.lax.fori_loop(
            0, chunk, inner, (h, best, best_j, best_qend))
        return (h, best, best_j, best_qend), None

    def scan_body(carry, j0):
        oh = jax.lax.dynamic_slice_in_dim(t_onehot, j0, chunk, axis=1)  # [B, chunk, 42]
        s_chunk = jnp.einsum("bka,aq->bkq", oh, prof_bf,
                             preferred_element_type=jnp.float32)
        return step(carry, (s_chunk, j0))

    # derive init values from t_len so their mesh-axis "varying" type matches
    # the loop body under shard_map (see jax shard_map scan-vma docs)
    zero_b = jnp.zeros_like(t_len, dtype=jnp.float32)
    h0 = jnp.zeros((B, Lq), dtype=jnp.float32) + zero_b[:, None]
    init = (h0, zero_b, jnp.zeros_like(t_len),
            jnp.zeros_like(t_len) + (Lq - 1))
    (h, best, best_j, best_qend), _ = jax.lax.scan(
        scan_body, init, jnp.arange(0, Lt, chunk, dtype=jnp.int32))
    return best, best_qend, best_j


@functools.partial(jax.jit, static_argnames=("chunk",))
def gapless_scores_only(prof2: jax.Array, t_aa: jax.Array, t_ss: jax.Array,
                        t_len: jax.Array, chunk: int = 64):
    """Score-only gapless kernel (no end positions): keeps a running
    elementwise max over the h state and reduces once at the end — ~3 VPU ops
    per cell, the prefilter fast path. End positions are recovered later by
    the alignment stage, mirroring the reference's two-phase design."""
    B, Lt = t_aa.shape
    Lq = prof2.shape[1]
    assert (Lt // chunk) * chunk == Lt
    prof_bf = prof2.astype(jnp.bfloat16)
    oh_aa = jax.nn.one_hot(t_aa.astype(jnp.int32), 21, dtype=jnp.bfloat16)
    oh_ss = jax.nn.one_hot(t_ss.astype(jnp.int32), 21, dtype=jnp.bfloat16)
    t_onehot = jnp.concatenate([oh_aa, oh_ss], axis=-1)
    # mask padded target columns once: padded one-hot rows scored very negative
    col_valid = (jnp.arange(Lt, dtype=jnp.int32)[None, :] < t_len[:, None])
    t_onehot = jnp.where(col_valid[:, :, None], t_onehot, 0)
    pad_pen = jnp.where(col_valid, 0.0, NEG).astype(jnp.float32)  # [B, Lt]

    def scan_body(carry, j0):
        h, best = carry
        oh = jax.lax.dynamic_slice_in_dim(t_onehot, j0, chunk, axis=1)
        pp = jax.lax.dynamic_slice_in_dim(pad_pen, j0, chunk, axis=1)
        s_chunk = jnp.einsum("bka,aq->bkq", oh, prof_bf,
                             preferred_element_type=jnp.float32)

        def inner(k, state):
            h, best = state
            s = s_chunk[:, k, :] + pp[:, k][:, None]
            diag = jnp.pad(h[:, :-1], ((0, 0), (1, 0)))
            h = jnp.maximum(diag + s, 0.0)
            best = jnp.maximum(best, h)
            return h, best

        h, best = jax.lax.fori_loop(0, chunk, inner, (h, best))
        return (h, best), None

    zero = jnp.zeros_like(t_len, dtype=jnp.float32)[:, None]
    h0 = jnp.zeros((B, Lq), dtype=jnp.float32) + zero
    best0 = h0
    (h, best), _ = jax.lax.scan(scan_body, (h0, best0),
                                jnp.arange(0, Lt, chunk, dtype=jnp.int32))
    return jnp.max(best, axis=1)


def gapless_scores_np(prof_aa: np.ndarray, prof_ss: np.ndarray,
                      t_aa: np.ndarray, t_ss: np.ndarray) -> int:
    """Scalar reference: best ungapped diagonal score (single target)."""
    Lq = prof_aa.shape[1]
    h = np.zeros(Lq, dtype=np.int64)
    best = 0
    for ca, cs in zip(t_aa, t_ss):
        s = prof_aa[ca] + prof_ss[cs]
        diag = np.empty_like(h)
        diag[0] = 0
        diag[1:] = h[:-1]
        h = np.maximum(diag + s, 0)
        best = max(best, int(h.max()))
    return best
