"""Batched device TM-score (ops/tm_device) vs the host reference path
(ops/tmscore.compute_tm_score, itself golden-tested against the reference
TMaligner — src/commons/TMaligner.cpp:50-104)."""
import numpy as np
import pytest

from foldseek_tpu.ops.tm_device import batched_tm_device
from foldseek_tpu.ops.tmscore import compute_tm_score


def _random_pairs(seed, n_pairs, m_pad):
    rng = np.random.default_rng(seed)
    xs, ys, mls, nls, ref = [], [], [], [], []
    for _ in range(n_pairs):
        n = int(rng.integers(10, m_pad - 2))
        q = np.cumsum(rng.normal(size=(n, 3), scale=2.2), axis=0).astype(np.float32)
        # noisy rigid transform of the walk
        a = rng.normal(size=3)
        th = np.linalg.norm(a)
        k = a / max(th, 1e-9)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K).astype(np.float32)
        t = (q @ R.T + rng.normal(size=(n, 3),
                                  scale=rng.uniform(0.2, 2.0))).astype(np.float32)
        norm = int(rng.integers(n, n + 30))
        r = compute_tm_score(q, t, 0, 0, "M" * n, norm)
        xa = np.zeros((m_pad, 3), np.float32)
        ya = np.zeros((m_pad, 3), np.float32)
        xa[:n] = t  # x = target
        ya[:n] = q  # y = query
        xs.append(xa)
        ys.append(ya)
        mls.append(n)
        nls.append(norm)
        ref.append(r.tmscore)
    return (np.stack(xs), np.stack(ys), np.array(mls), np.array(nls),
            np.array(ref))


def test_batched_tm_matches_host():
    xa, ya, m_len, norm, ref = _random_pairs(7, 10, 64)
    tm = batched_tm_device(xa, ya, m_len, norm, chunk=4)
    # f32 device vs f64 host: ~1e-6 on stable search paths, up to ~1e-3
    # when a borderline cut set diverges (the same program in f64 agrees
    # with the host to 1.5e-8)
    assert np.abs(tm - ref).max() < 2e-3
    assert np.abs(tm - ref).mean() < 3e-4


def test_batched_tm_gapped_backtrace():
    """Gapped alignments: device path consumes the same aligned index sets
    the host extracts from the backtrace."""
    from foldseek_tpu.ops.lddt import backtrace_indices
    rng = np.random.default_rng(11)
    nq, nt = 48, 52
    q = np.cumsum(rng.normal(size=(nq, 3), scale=2.0), axis=0).astype(np.float32)
    t = np.cumsum(rng.normal(size=(nt, 3), scale=2.0), axis=0).astype(np.float32)
    bt = "M" * 20 + "D" * 4 + "M" * 10 + "I" * 2 + "M" * 14
    ref = compute_tm_score(q, t, 2, 1, bt, nq)
    q_idx, t_idx = backtrace_indices(bt, 2, 1)
    m = len(q_idx)
    xa = np.zeros((1, 64, 3), np.float32)
    ya = np.zeros((1, 64, 3), np.float32)
    xa[0, :m] = t[t_idx]
    ya[0, :m] = q[q_idx]
    tm = batched_tm_device(xa, ya, np.array([m]), np.array([nq]), chunk=1)
    assert tm[0] == pytest.approx(ref.tmscore, abs=2e-3)
