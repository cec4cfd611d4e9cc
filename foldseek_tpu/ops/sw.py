"""Smith-Waterman structural alignment scoring on TPU.

Dual-alphabet (3Di + AA) local alignment with affine gaps, the core scoring
step of `structurealign` (reference: src/commons/StructureSmithWaterman.cpp:
sw_sse2_byte/word/int — Farrar striped SIMD with byte->word->int escalation).

TPU-native design: instead of striping one query over SIMD lanes, we batch
many padded targets and scan target columns with `lax.scan`, holding the
H/E state for the full query in vector registers ([B, Lq] int32). The
intra-column F recurrence is resolved with a log-step prefix-max instead of
Farrar's lazy-F loop. Using int32 throughout makes the byte/word escalation
unnecessary — scores are exact on the first pass.

Semantics mirrored from the reference kernels:
  * gap of length l costs gap_open + (l-1) * gap_extend
  * per-cell score = mat_aa[t_aa][q_aa] + bias_aa[q] + mat_3di[t_ss][q_ss] + bias_ss[q]
    (createQueryProfile, StructureSmithWaterman.cpp:206-229)
  * E (gap in target / 'I') opens from H *before* F is applied — the lazy-F
    loop "disallow[s] adjacent insertion and then deletion"
    (StructureSmithWaterman.cpp:1230)
  * ties: best target end = first column reaching the max (strict >,
    StructureSmithWaterman.cpp:1272-1277); best query end = smallest query
    index in that column (:1052-1059)
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .matrices import ALPHA_SIZE, blosum62, mat3di

NEG_INF = -(2**30)


def calc_comp_bias(seq_num: np.ndarray, sub_mat: np.ndarray, p_back: np.ndarray,
                   scale: float) -> np.ndarray:
    """Windowed composition bias correction, float then rounded to int8 range
    (reference: lib/mmseqs/src/commons/SubstitutionMatrix.cpp:79-109 and the
    int8 rounding in StructureSmithWaterman.cpp:1567).

    Note the reference computes *both* the AA and the 3Di bias against the AA
    substitution matrix and AA background (ssw_init passes `m`=subMatAA for
    both, StructureSmithWaterman.cpp:1564-1574) — mirrored here by the caller.
    """
    N = len(seq_num)
    w = 40
    rows = sub_mat[seq_num].astype(np.int64)  # [N, 21]
    scores = rows[:, seq_num]  # [N, N] int scores
    # windowed sum via cumulative sums (exact: integer math)
    idx = np.arange(N)
    lo = np.maximum(0, idx - w // 2)
    hi = np.minimum(N, idx + w // 2)
    csum = np.zeros((N, N + 1), dtype=np.int64)
    np.cumsum(scores, axis=1, out=csum[:, 1:])
    win = csum[idx, hi] - csum[idx, lo] - scores[idx, idx]
    # float32 sequential accumulation identical to the reference loop
    # (float deltaS_i += double(pBack[a]) * float(short score))
    delta = (win.astype(np.float64) / (-1.0 * (hi - lo))).astype(np.float32)
    n_alpha = sub_mat.shape[0]
    for a in range(n_alpha):
        delta = (delta.astype(np.float64) + p_back[a] * rows[:, a].astype(np.float64)).astype(np.float32)
    out = np.float32(scale) * delta
    b = np.where(out < 0.0, out - 0.5, out + 0.5)
    return b.astype(np.int8)


class QueryProfile:
    """Per-query combined scoring profile for device + host use.

    prof[a_aa, a_ss, i] is too big; instead we keep two [21, Lq] tables that
    the kernel gathers per target column and adds — matching the reference's
    two-profile sum per cell (StructureSmithWaterman.cpp:1179).
    """

    def __init__(self, q_aa: np.ndarray, q_ss: np.ndarray,
                 comp_bias_correction: bool = True,
                 comp_bias_scale: float = 0.5,
                 gap_open: int = 10, gap_extend: int = 1,
                 with_aa: bool = True):
        # with_aa=False is 3Di-only alignment (--alignment-type 0): the
        # reference builds the AA matrix at bit factor 0.0 so every AA score
        # and its composition bias are zero (structurealign.cpp:264-265)
        m3 = mat3di()
        mb = blosum62()
        self.q_aa = np.asarray(q_aa, dtype=np.int8)
        self.q_ss = np.asarray(q_ss, dtype=np.int8)
        self.L = len(q_aa)
        self.gap_open = gap_open
        self.gap_extend = gap_extend
        self._bias_on = comp_bias_correction
        self._bias_scale = comp_bias_scale
        self._with_aa = with_aa
        if comp_bias_correction and with_aa:
            # both biases come from the AA matrix (ssw_init's `m` arg,
            # structurealign.cpp:344); at aa bit factor 0.0 that matrix is
            # all-zero, so 3Di-only mode has zero bias on both alphabets
            self.bias_aa = calc_comp_bias(self.q_aa, mb.scores, mb.p_back, 1.0)
            self.bias_ss = calc_comp_bias(self.q_ss, mb.scores, mb.p_back, comp_bias_scale)
        else:
            self.bias_aa = np.zeros(self.L, dtype=np.int8)
            self.bias_ss = np.zeros(self.L, dtype=np.int8)
        # [21, Lq] tables: row = target letter, col = query position
        aa_scores = mb.scores if with_aa else np.zeros_like(mb.scores)
        self.prof_aa = (aa_scores[:, self.q_aa].astype(np.int32)
                        + self.bias_aa[None, :].astype(np.int32))
        self.prof_ss = (m3.scores[:, self.q_ss].astype(np.int32)
                        + self.bias_ss[None, :].astype(np.int32))

    def reversed(self) -> "QueryProfile":
        """Profile of the reversed query. The reference reverses the sequence
        and recomputes the composition bias (structurealign.cpp:345-347); the
        [i-20, i+20) window is not mirror-symmetric, so the bias must be
        recomputed, not flipped."""
        rev = object.__new__(QueryProfile)
        rev.q_aa = self.q_aa[::-1].copy()
        rev.q_ss = self.q_ss[::-1].copy()
        rev.L = self.L
        rev.gap_open = self.gap_open
        rev.gap_extend = self.gap_extend
        mb = blosum62()
        has_bias = bool((self.bias_aa.any() or self.bias_ss.any() or self._bias_on)
                        and self._with_aa)
        if has_bias:
            rev.bias_aa = calc_comp_bias(rev.q_aa, mb.scores, mb.p_back, 1.0)
            rev.bias_ss = calc_comp_bias(rev.q_ss, mb.scores, mb.p_back, self._bias_scale)
        else:
            rev.bias_aa = np.zeros(self.L, dtype=np.int8)
            rev.bias_ss = np.zeros(self.L, dtype=np.int8)
        rev._bias_on = self._bias_on
        rev._bias_scale = self._bias_scale
        rev._with_aa = self._with_aa
        m3 = mat3di()
        aa_scores = mb.scores if self._with_aa else np.zeros_like(mb.scores)
        rev.prof_aa = (aa_scores[:, rev.q_aa].astype(np.int32)
                       + rev.bias_aa[None, :].astype(np.int32))
        rev.prof_ss = (m3.scores[:, rev.q_ss].astype(np.int32)
                       + rev.bias_ss[None, :].astype(np.int32))
        return rev

    def flipped(self) -> "QueryProfile":
        """Reverse-copied profile (sequence AND bias flipped) — this is what
        the reference uses for start-position recovery
        (StructureSmithWaterman.cpp:1703-1706 reverse_copy of the forward
        composition bias), unlike reversed() which recomputes the bias."""
        rev = object.__new__(QueryProfile)
        rev.q_aa = self.q_aa[::-1].copy()
        rev.q_ss = self.q_ss[::-1].copy()
        rev.L = self.L
        rev.gap_open = self.gap_open
        rev.gap_extend = self.gap_extend
        rev.bias_aa = self.bias_aa[::-1].copy()
        rev.bias_ss = self.bias_ss[::-1].copy()
        rev._bias_on = self._bias_on
        rev._bias_scale = self._bias_scale
        rev._with_aa = getattr(self, "_with_aa", True)
        rev.prof_aa = self.prof_aa[:, ::-1].copy()
        rev.prof_ss = self.prof_ss[:, ::-1].copy()
        return rev

    def padded(self, lq_pad: int) -> Tuple[np.ndarray, np.ndarray]:
        """[21, lq_pad] profiles, padding scores NEG_INF so padded query rows
        never participate."""
        pa = np.full((ALPHA_SIZE, lq_pad), NEG_INF // 4, dtype=np.int32)
        ps = np.full((ALPHA_SIZE, lq_pad), NEG_INF // 4, dtype=np.int32)
        pa[:, : self.L] = self.prof_aa
        ps[:, : self.L] = self.prof_ss
        return pa, ps


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend"))
def sw_score_endpos(prof_aa: jax.Array, prof_ss: jax.Array,
                    t_aa: jax.Array, t_ss: jax.Array, t_len: jax.Array,
                    gap_open: int = 10, gap_extend: int = 1):
    """Batched SW score + end positions of one query vs padded targets.

    Args:
      prof_aa, prof_ss: int32 [21, Lq] combined query profiles (bias included;
        padded query positions must hold a very negative score).
      t_aa, t_ss: int8/int32 [B, Lt] numeric target sequences (pad value 20 'X'
        is fine — masked by t_len).
      t_len: int32 [B] true target lengths.
    Returns:
      score: int32 [B] best local alignment score (0 if none)
      q_end: int32 [B] 0-based query end position (reference tie-breaking)
      t_end: int32 [B] 0-based target end position
    """
    B, Lt = t_aa.shape
    Lq = prof_aa.shape[1]
    t_aa = t_aa.astype(jnp.int32)
    t_ss = t_ss.astype(jnp.int32)

    prof_aa_T = prof_aa.T  # [Lq] fast axis last? gather rows by letter: use [21, Lq]
    qpos = jnp.arange(Lq, dtype=jnp.int32)

    def step(carry, j):
        H, E, best_score, best_j, best_qend = carry
        # per-target column scores: gather profile columns by target letter
        ta = t_aa[:, j]  # [B]
        ts = t_ss[:, j]
        s = prof_aa[ta, :] + prof_ss[ts, :]  # [B, Lq]
        # diagonal: H shifted right along query axis, 0 at query pos 0
        diag = jnp.pad(H[:, :-1], ((0, 0), (1, 0)))
        h_noF = jnp.maximum(jnp.maximum(diag + s, E), 0)
        # F via prefix-max: F[i] = max_{k<i}(h_noF[k] + k*ge) - (i-1)*ge - go
        g = h_noF + qpos[None, :] * gap_extend
        pmax = jax.lax.associative_scan(jnp.maximum, g, axis=1)
        pmax_excl = jnp.pad(pmax[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF)
        F = pmax_excl - (qpos[None, :] - 1) * gap_extend - gap_open
        H_new = jnp.maximum(h_noF, F)
        # E for next column opens from h_noF (no F->E, lazy-F convention)
        E_new = jnp.maximum(E - gap_extend, h_noF - gap_open)
        # column max + tie-breaking
        valid = j < t_len  # [B]
        col_max = jnp.max(H_new, axis=1)
        col_max = jnp.where(valid, col_max, -1)
        improved = col_max > best_score
        col_qend = jnp.argmax(H_new == col_max[:, None], axis=1).astype(jnp.int32)
        best_score = jnp.where(improved, col_max, best_score)
        best_j = jnp.where(improved, j, best_j)
        best_qend = jnp.where(improved, col_qend, best_qend)
        return (H_new, E_new, best_score, best_j, best_qend), None

    H0 = jnp.zeros((B, Lq), dtype=jnp.int32)
    E0 = jnp.full((B, Lq), NEG_INF, dtype=jnp.int32)
    init = (H0, E0,
            jnp.zeros(B, dtype=jnp.int32),
            jnp.zeros(B, dtype=jnp.int32),
            jnp.full(B, Lq - 1, dtype=jnp.int32))
    (H, E, score, t_end, q_end), _ = jax.lax.scan(
        step, init, jnp.arange(Lt, dtype=jnp.int32))
    return score, q_end, t_end


def sw_score_endpos_np(prof_aa, prof_ss, t_aa, t_ss,
                       gap_open=10, gap_extend=1, terminate=0, reverse_target=False):
    """Reference-exact scalar implementation (single target), used for start
    position recovery and unit testing. Mirrors sw_sse2_word semantics incl.
    the `terminate` early stop of the reverse pass
    (StructureSmithWaterman.cpp:1282 maxColumn[i] == terminate break)."""
    Lq = prof_aa.shape[1]
    Lt = len(t_aa)
    H = np.zeros(Lq, dtype=np.int64)
    E = np.full(Lq, -(2**31), dtype=np.int64)
    best = 0
    best_j = 0
    best_qend = Lq - 1
    qidx = np.arange(Lq)
    cols = range(Lt - 1, -1, -1) if reverse_target else range(Lt)
    for j in cols:
        s = prof_aa[t_aa[j]] + prof_ss[t_ss[j]]
        diag = np.empty_like(H)
        diag[0] = 0
        diag[1:] = H[:-1]
        h_noF = np.maximum(np.maximum(diag + s, E), 0)
        g = h_noF + qidx * gap_extend
        pmax = np.maximum.accumulate(g)
        F = np.empty_like(H)
        F[0] = -(2**31)
        F[1:] = pmax[:-1] - (qidx[1:] - 1) * gap_extend - gap_open
        H = np.maximum(h_noF, F)
        E = np.maximum(E - gap_extend, h_noF - gap_open)
        col_max = int(H.max())
        if col_max > best:
            best = col_max
            best_j = j
            best_qend = int(np.argmax(H == col_max))
        if terminate and col_max == terminate:
            break
    return best, best_qend, best_j
