"""samplemulambda: per-query Gumbel (mu, lambda) estimation from alignments
against shuffled targets — the training-data generator for the E-value
neural net (reference: src/strucclustutils/samplemulambda.cpp: ran2-shuffled
targets, score-only structural SW, EVD maximum-likelihood fit; the fit is
the classic HMMER EvdMaxLikelyFit Newton iteration on lambda).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..db.storage import StructDB
from ..ops.sw import QueryProfile, sw_score_endpos
from ..utils.log import logger


def evd_max_likelihood_fit(scores: np.ndarray) -> Tuple[float, float]:
    """Maximum-likelihood Gumbel fit; Newton on lambda then closed-form mu
    (Lawless 1982, as in the reference's esl/squid-derived fit)."""
    x = np.asarray(scores, dtype=np.float64)
    lam = 0.2
    for _ in range(100):
        e = np.exp(-lam * x)
        s0 = e.sum()
        s1 = (x * e).sum()
        s2 = (x * x * e).sum()
        f = 1.0 / lam - x.mean() + s1 / s0
        df = -1.0 / (lam * lam) + (s1 * s1 - s0 * s2) / (s0 * s0)
        step = f / df
        lam -= step
        if lam <= 0:
            lam = 0.001
        if abs(step) < 1e-7:
            break
    mu = -np.log(np.exp(-lam * x).mean()) / lam
    return float(mu), float(lam)


def sample_mu_lambda(qdb: StructDB, tdb: StructDB, n_samples: int = 100,
                     seed: int = 42, gap_open: int = 10,
                     gap_extend: int = 1) -> Dict[int, Tuple[float, float]]:
    """For every query: SW scores against n_samples shuffled targets, EVD
    fit. Returns key -> (mu, lambda)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    # sample target sequences (with replacement) once, shuffle residues
    t_idx = rng.randint(0, tdb.size, size=n_samples)
    shuffled = []
    for ti in t_idx:
        aa = np.asarray(tdb.get_aa(ti)).copy()
        ss = np.asarray(tdb.get_ss(ti)).copy()
        perm = rng.permutation(len(aa))
        shuffled.append((aa[perm], ss[perm]))
    lt_pad = max(8, 1 << (max(len(a) for a, _ in shuffled) - 1).bit_length())
    t_aa = np.full((n_samples, lt_pad), 20, dtype=np.int8)
    t_ss = np.full((n_samples, lt_pad), 20, dtype=np.int8)
    t_len = np.zeros(n_samples, dtype=np.int32)
    for i, (aa, ss) in enumerate(shuffled):
        t_aa[i, :len(aa)] = aa
        t_ss[i, :len(ss)] = ss
        t_len[i] = len(aa)

    out = {}
    for qi in range(qdb.size):
        prof = QueryProfile(np.asarray(qdb.get_aa(qi)), np.asarray(qdb.get_ss(qi)),
                            gap_open=gap_open, gap_extend=gap_extend)
        lq_pad = max(8, 1 << (prof.L - 1).bit_length())
        pa, ps = prof.padded(lq_pad)
        scores, _, _ = sw_score_endpos(
            jnp.asarray(pa), jnp.asarray(ps), jnp.asarray(t_aa),
            jnp.asarray(t_ss), jnp.asarray(t_len),
            gap_open=gap_open, gap_extend=gap_extend)
        mu, lam = evd_max_likelihood_fit(np.asarray(scores))
        out[int(qdb.keys[qi])] = (mu, lam)
    logger.info("samplemulambda: fitted %d queries over %d shuffles",
                qdb.size, n_samples)
    return out
