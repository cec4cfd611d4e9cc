"""Gapless (ungapped) diagonal scoring — scalar semantics reference.

The reference's exhaustive ungapped prefilter scores every query/target pair
with the best local ungapped diagonal (reference:
lib/mmseqs/src/prefiltering/ungappedprefilter.cpp:338-474 CPU,
lib/mmseqs/lib/libmarv CUDA `Marv::scan`; foldseek forces this mode on GPU,
src/workflow/StructureSearch.cpp:110-112). Recurrence per cell (Kadane along
diagonals):  h[i][j] = max(0, h[i-1][j-1] + S(q_i, t_j)),  score = max h.

The production kernels live in ops/gapless_pallas.py (multi-query stacked
MXU/VPU Pallas kernels over transposed panels). This module keeps only the
scalar implementation the parity tests check those kernels against; earlier
XLA-scan device variants were removed once the Pallas path covered every
caller (they round-tripped the DP state through HBM and measured ~10x
slower).
"""
from __future__ import annotations

import numpy as np


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
