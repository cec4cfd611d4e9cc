"""Batched TM-score of fixed alignments on the accelerator.

Device-side re-expression of ops/tmscore.py (reference:
src/commons/TMaligner.cpp:50-104, lib/tmalign/TMalign.cpp:394-547
TMscore8_search_standard, :76-143 score_fun8): the same fragment-seeded
iterative superposition search, with every data-dependent construct made
fixed-shape so one jitted program scores a whole fleet of hits:

- superposition: Horn's quaternion method (eigh of the 4x4 key matrix)
  instead of 3x3 SVD Kabsch — identical proper rotation, and batched
  4x4 eigh vectorizes where small-matrix SVD does not;
- ALL fragment slots run as one batched dimension (a static 6 x S_max
  grid); the only sequential axis is the 20 refinement iterations, so a
  whole fleet costs ~42 batched eigh launches instead of thousands of
  tiny ones (the first formulation ran 6 s on 672 pairs; this one ~60 ms).
  Slots past the real (l_ini, start) enumeration clamp to fragments the
  reference also evaluates, so duplicates cannot change the running max;
- the score_fun8 d-growth loop ("grow d by 0.5 until >= 3 points") in
  closed form from the 3rd-smallest pair distance;
- the <=20 refinement iterations run exactly 20 times — once a cut set
  reaches its fixed point every further iteration reproduces the same
  superposition and score, leaving the max unchanged.

float32 on device vs float64 on the host path: TM values agree to ~1e-6
relative when the search path is stable (verified 1.5e-8 in an f64 run of
this exact program); borderline cut sets can diverge to ~1e-3. align_all
only enables this path on the TPU backend for large hit fleets — the host
native path stays the parity reference.
"""
from __future__ import annotations

import functools

import numpy as np

SIMPLIFY_STEP = 40
REFINE_ITERS = 20


def _cofactors4(A):
    """Cofactor matrix C of batched 4x4 A (adj(A) = C^T), unrolled to
    elementwise ops — no linalg primitives."""
    import jax.numpy as jnp
    rows_of = [[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]]
    C = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            r = rows_of[i]
            c = rows_of[j]
            m = lambda a, b: A[..., r[a], c[b]]
            det3 = (m(0, 0) * (m(1, 1) * m(2, 2) - m(1, 2) * m(2, 1))
                    - m(0, 1) * (m(1, 0) * m(2, 2) - m(1, 2) * m(2, 0))
                    + m(0, 2) * (m(1, 0) * m(2, 1) - m(1, 1) * m(2, 0)))
            C[i][j] = det3 if (i + j) % 2 == 0 else -det3
    return jnp.stack([jnp.stack(row, -1) for row in C], -2)


def _max_eigvec4(N, lam0, iters=12):
    """Largest eigenvalue + eigenvector of batched symmetric TRACELESS 4x4
    N via Newton on the characteristic quartic (lam0 >= lambda_max) and the
    adjugate null-space trick (Theobald 2005 QCP) — XLA's batched eigh
    lowers to ~48 ms per call on TPU; this is pure VPU arithmetic.

    N is normalized by lam0 before the quartic: raw entries scale with
    sum|x|^2 (~1e4-1e5 for protein fragments), so p(lam) ~ lam^4 ~ 1e18
    and f32 evaluation of the near-root difference cancels to ~1e13
    absolute noise, stalling Newton at |dlam|/lam ~ 1e-3 — measured as a
    one-sided TM deficit (median -1.7e-4, 70% of pairs low) on a 2k-target
    scale-parity run because a suboptimal rotation can only lower the
    score. Normalized, all coefficients are O(1) and the root lands at
    ~1e-6 relative."""
    import jax.numpy as jnp
    s = jnp.maximum(lam0, jnp.asarray(1e-30, N.dtype))
    N = N / s[..., None, None]
    lam0 = jnp.ones_like(lam0)
    N2 = N @ N
    N3 = N2 @ N
    tr = lambda a: a[..., 0, 0] + a[..., 1, 1] + a[..., 2, 2] + a[..., 3, 3]
    c2 = -0.5 * tr(N2)
    c1 = -tr(N3) / 3.0
    Ccof = _cofactors4(N)
    c0 = (N[..., 0, 0] * Ccof[..., 0, 0] + N[..., 0, 1] * Ccof[..., 0, 1]
          + N[..., 0, 2] * Ccof[..., 0, 2] + N[..., 0, 3] * Ccof[..., 0, 3])

    # unrolled Newton (quadratic convergence from the upper bound; a
    # lax.scan here would add `iters` sequential loop steps inside every
    # refinement iteration — measured as the dominant latency)
    lam = lam0
    for _ in range(iters):
        p = ((lam * lam + c2) * lam + c1) * lam + c0
        dp = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        lam = lam - p / jnp.where(jnp.abs(dp) > 1e-12, dp,
                                  jnp.where(dp >= 0, 1e-12, -1e-12))

    A = N - lam[..., None, None] * jnp.eye(4, dtype=N.dtype)
    Ca = _cofactors4(A)            # rows of Ca = columns of adj(A) ∝ v
    norms = (Ca * Ca).sum(-1)      # [.., 4] squared norm per candidate row
    best = norms.argmax(-1)
    v = jnp.take_along_axis(Ca, best[..., None, None]
                            .repeat(4, -1).astype(jnp.int32), -2)[..., 0, :]
    nrm = jnp.sqrt((v * v).sum(-1, keepdims=True))
    # degenerate (eigenvalue multiplicity): adjugate vanishes -> identity
    v = jnp.where(nrm > 1e-6, v / jnp.maximum(nrm, 1e-30),
                  jnp.array([1.0, 0.0, 0.0, 0.0], dtype=N.dtype))
    return lam * s, v


def _horn_masked_batch(x, y, w):
    """Optimal proper rotations for S weighted subsets of one point set:
    x/y [M, 3], w [S, M] 0/1 weights -> R [S, 3, 3], t [S, 3] with
    y ~ R x + t per subset. Horn 1987 via the 4x4 key matrix."""
    import jax.numpy as jnp
    n = jnp.maximum(w.sum(-1), 1.0)[:, None]          # [S, 1]
    xb = (w @ x) / n                                  # [S, 3]
    yb = (w @ y) / n
    xc = (x[None, :, :] - xb[:, None, :]) * w[:, :, None]
    yc = (y[None, :, :] - yb[:, None, :]) * w[:, :, None]
    S = jnp.einsum("sma,smb->sab", xc, yc)            # (w^2 == w for 0/1)
    sxx, sxy, sxz = S[:, 0, 0], S[:, 0, 1], S[:, 0, 2]
    syx, syy, syz = S[:, 1, 0], S[:, 1, 1], S[:, 1, 2]
    szx, szy, szz = S[:, 2, 0], S[:, 2, 1], S[:, 2, 2]
    row0 = jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1)
    row1 = jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1)
    row2 = jnp.stack([szx - sxz, sxy + syx, syy - sxx - szz, syz + szy], -1)
    row3 = jnp.stack([sxy - syx, szx + sxz, syz + szy, szz - sxx - syy], -1)
    N = jnp.stack([row0, row1, row2, row3], -2)       # [S, 4, 4]
    # lambda_max upper bound: (G1 + G2) / 2 (Theobald's E0)
    lam0 = 0.5 * ((xc * xc).sum((-1, -2)) + (yc * yc).sum((-1, -2)))
    _, q = _max_eigvec4(N, lam0)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
                   2 * (qx * qz + qw * qy)], -1),
        jnp.stack([2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
                   2 * (qy * qz - qw * qx)], -1),
        jnp.stack([2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
                   1 - 2 * (qx * qx + qy * qy)], -1)], -2)
    t = yb - jnp.einsum("sab,sb->sa", R, xb)
    return R, t


def _tm_search_one(x, y, l_ali, d0_pair, d0_search_pair, score_d8, s_max):
    """One pair, BOTH parameterizations (standard + search — compute_tm_score
    :177-185) evaluated as the two halves of one 2*6*s_max batched slot
    axis (one program instead of two: halves compile time). d0_pair /
    d0_search_pair: [2] per-parameterization values. Returns [2] best
    score sums (NOT yet normalized). x/y: [M, 3] padded aligned
    target/query coords."""
    import jax
    import jax.numpy as jnp

    M = x.shape[0]
    dt = x.dtype
    n_half = 6 * s_max
    S = 2 * n_half
    idx = jnp.arange(M)
    valid = idx < l_ali
    l_min = jnp.minimum(4, l_ali)
    half = jnp.arange(S) // n_half                        # [S] 0/1
    d0 = d0_pair[half]                                    # [S]
    d0_search = d0_search_pair[half]
    d0_2 = d0 * d0
    d8_2 = score_d8 * score_d8

    def score_and_cut(R, t, d):
        # R [S,3,3], t [S,3], d [S] -> scores [S], cuts [S,M]
        xt = jnp.einsum("sab,mb->sma", R, x) + t[:, None, :]
        di = ((xt - y[None, :, :]) ** 2).sum(-1)          # [S, M]
        di = jnp.where(valid[None, :], di, jnp.inf)
        sc = jnp.where(di < d8_2, 1.0 / (1.0 + di / d0_2[:, None]),
                       0.0).sum(-1)
        cnt = (di < (d * d)[:, None]).sum(-1)             # [S]
        need_grow = (cnt < 3) & (l_ali > 3)
        # 3rd smallest via three masked reductions (top_k is slow on TPU);
        # exact float ties would skip duplicates — measure-zero on real
        # coordinates, and a larger cut only when the tie is exact
        m1 = di.min(-1, keepdims=True)
        d_2 = jnp.where(di <= m1, jnp.inf, di)
        m2 = d_2.min(-1, keepdims=True)
        d3 = jnp.where(d_2 <= m2, jnp.inf, d_2).min(-1)
        k = jnp.floor((jnp.sqrt(d3) - d) / 0.5) + 1.0
        d_use = jnp.where(need_grow, d + 0.5 * k, d)
        cut = (valid[None, :] & (di < (d_use * d_use)[:, None])).astype(dt)
        return sc, cut

    # static fragment slot grid (duplicates clamp to evaluated fragments)
    slots = jnp.arange(S) % n_half
    li = slots // s_max
    sj = slots % s_max
    l_frag = jnp.where(li >= 5, l_min, jnp.maximum(l_ali >> li, l_min))
    il_max = l_ali - l_frag
    start = jnp.minimum(SIMPLIFY_STEP * sj, il_max)
    frag = ((idx[None, :] >= start[:, None])
            & (idx[None, :] < (start + l_frag)[:, None])).astype(dt)

    R, t = _horn_masked_batch(x, y, frag)
    sc, cut = score_and_cut(R, t, d0_search - 1.0)
    best = sc.reshape(2, n_half).max(-1)

    # refinement as a while_loop with a convergence predicate: once every
    # slot's cut set is a fixed point, further iterations reproduce the
    # same superposition/score (the reference breaks per-fragment on
    # new_cut == cut; under vmap the loop runs until the whole batch
    # converges — typically 3-8 of the 20 allowed iterations)
    def cond(carry):
        _, _, i, changed = carry
        return (i < REFINE_ITERS) & changed

    def refine(carry):
        best, cut, i, _ = carry
        R, t = _horn_masked_batch(x, y, cut)
        sc, new_cut = score_and_cut(R, t, d0_search + 1.0)
        changed = jnp.any(new_cut != cut)
        return (jnp.maximum(best, sc.reshape(2, n_half).max(-1)),
                new_cut, i + 1, changed)
    best, _, _, _ = jax.lax.while_loop(
        cond, refine, (best, cut, jnp.int32(0), jnp.bool_(True)))
    return best


def _params_for(norm_len: np.ndarray):
    """Vectorized parameter_set4search + the standard-TMscore d0
    (ops/tmscore.py compute_tm_score :169-183)."""
    lnorm = np.maximum(np.asarray(norm_len, dtype=np.float64), 1.0)
    d0 = np.where(lnorm <= 19, 0.168,
                  1.24 * np.cbrt(np.maximum(lnorm - 15.0, 1e-9)) - 1.8)
    d0 = d0 + 0.8  # d0_min
    d0_search = np.clip(d0, 4.5, 8.0)
    score_d8 = 1.5 * lnorm ** 0.3 + 3.5
    d0_std = np.where(lnorm > 21,
                      1.24 * np.cbrt(np.maximum(lnorm - 15.0, 1e-9)) - 1.8, 0.5)
    d0_std = np.maximum(d0_std, 0.5)
    return (d0.astype(np.float32), d0_search.astype(np.float32),
            score_d8.astype(np.float32), d0_std.astype(np.float32))


@functools.lru_cache(maxsize=None)
def _compiled(m_pad: int, chunk: int):
    import jax
    import jax.numpy as jnp

    s_max = max(1, (m_pad - 1) // SIMPLIFY_STEP + 2)

    def one(x, y, l_ali, d0, d0_search, score_d8, d0_std):
        # tm = max(standard pass with d0_std, search pass with d0/d0_search)
        # (compute_tm_score :177-185); both normalized by l_ali here, the
        # caller rescales by n_al / norm_len
        best = _tm_search_one(x, y, l_ali,
                              jnp.stack([d0_std, d0]),
                              jnp.stack([d0_std, d0_search]),
                              score_d8, s_max)
        return best.max() / jnp.maximum(l_ali.astype(x.dtype), 1.0)

    def chunk_fn(args):
        return jax.vmap(one)(*args)

    @jax.jit
    def run(xa, ya, l_ali, d0, d0s, sd8, d0std):
        n_chunks = xa.shape[0] // chunk
        def reshape(a):
            return a.reshape((n_chunks, chunk) + a.shape[1:])
        return jax.lax.map(chunk_fn, tuple(
            reshape(a) for a in (xa, ya, l_ali, d0, d0s, sd8, d0std)))
    return run


def batched_tm_device(xa: np.ndarray, ya: np.ndarray, m_len: np.ndarray,
                      norm_len: np.ndarray, chunk: int = 0) -> np.ndarray:
    """TM-scores for a fleet of fixed alignments.

    xa/ya: [P, M_pad, 3] padded aligned target/query C-alpha coords
    (x superposed onto y, the TMaligner x=target convention), m_len: [P]
    aligned column counts, norm_len: [P] normalization lengths.
    Returns tm [P] float32."""
    import jax.numpy as jnp

    P, M, _ = xa.shape
    if chunk == 0:
        # bound the [chunk, 2*6*s_max, M] intermediates to ~128 MB
        s_max = max(1, (M - 1) // SIMPLIFY_STEP + 2)
        chunk = int(max(8, min(512, (1 << 25) // max(1, 12 * s_max * M))))
    d0, d0_search, score_d8, d0_std = _params_for(np.asarray(norm_len))
    m_len = np.asarray(m_len, dtype=np.int32)
    pad = (-P) % chunk
    def padp(a):
        if pad == 0:
            return a  # already chunk-padded by the caller: no 100s-MB copy
        return np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    run = _compiled(M, chunk)
    out = run(jnp.asarray(padp(np.asarray(xa, np.float32))),
              jnp.asarray(padp(np.asarray(ya, np.float32))),
              jnp.asarray(padp(m_len)),
              jnp.asarray(padp(d0)), jnp.asarray(padp(d0_search)),
              jnp.asarray(padp(score_d8)), jnp.asarray(padp(d0_std)))
    tm = np.asarray(out).reshape(-1)[:P]
    # the fragment score is sum/l_ali; the reference reports
    # score * n_al / norm_len (compute_tm_score :179,183)
    return tm * m_len / np.maximum(np.asarray(norm_len, np.float32), 1.0)
