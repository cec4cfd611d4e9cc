"""Forward-backward posterior aligner: exact brute-force validation."""
import numpy as np


def brute_force_posterior(s, go, ge, T):
    """Enumerate every local alignment (start/end at any match, affine
    single-direction gap runs between matches — matching the E/F state
    transitions) and accumulate exact pair posteriors."""
    s = s / T
    go_, ge_ = go / T, ge / T
    L1, L2 = s.shape
    pair_mass = np.zeros((L1, L2))
    total = 0.0

    def walk(i, j, w, pairs):
        nonlocal total
        total += w
        for (a, b) in pairs:
            pair_mass[a, b] += w
        # next match after a gap run in exactly one direction (or none)
        for a in range(0, L1 - i - 1):
            for b in range(0, L2 - j - 1):
                if a > 0 and b > 0:
                    continue
                gap = 0.0
                if a > 0:
                    gap = go_ + (a - 1) * ge_
                if b > 0:
                    gap = go_ + (b - 1) * ge_
                ni, nj = i + 1 + a, j + 1 + b
                walk(ni, nj, w * np.exp(gap + s[ni, nj]), pairs + [(ni, nj)])

    for i in range(L1):
        for j in range(L2):
            walk(i, j, float(np.exp(s[i, j])), [(i, j)])
    return pair_mass / total


def test_fwbw_matches_bruteforce():
    from foldseek_tpu.ops.fwbw import fwbw_posterior
    rng = np.random.RandomState(0)
    s = rng.randn(4, 3) * 2.0
    P, _ = fwbw_posterior(s, gap_open=-1.5, gap_extend=-0.5, temperature=2.0)
    P_ref = brute_force_posterior(s, -1.5, -0.5, 2.0)
    assert np.abs(P - P_ref).max() < 1e-9, (P, P_ref)


def test_fwbw_diagonal_signal():
    from foldseek_tpu.ops.fwbw import fwbw_posterior, mac_backtrace
    L = 24
    s = np.full((L, L), -2.0)
    np.fill_diagonal(s, 4.0)
    P, max_p = fwbw_posterior(s, -1.5, 0.0, 4.0)
    assert max_p > 0.5
    pairs = mac_backtrace(P)
    on_diag = sum(1 for i, j in pairs if i == j)
    assert on_diag >= L - 2
