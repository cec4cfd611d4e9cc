"""Sequence profiles (PSSMs) for both alphabets — result2profile /
result2structprofile and iterative profile search.

Port of the MMseqs2 PSSM pipeline with position-based sequence weighting
(reference: lib/mmseqs/src/alignment/PSSMCalculator.cpp: Henikoff weights
:311-373, match weights :396-410, Neff :283-309, substitution pseudocounts
:274-282,:375-394 with pca 1.1 / pcb 4.1) applied to both the AA and the
3Di tracks (reference: data/result2structprofile.sh). Profiles store
per-position probabilities; integer scores are regenerated at the search
bit scales exactly like substitution matrices (structurealign.cpp:252-265).

Uses the simple sequence-weight path (the reference's --wg 1); the
context-specific HH-suite weighting is a TODO.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..db.storage import StructDB
from ..ops.matrices import blosum62, mat3di
from ..utils.log import logger
from .results import AlnResult

GAP = 255
N_AA = 20
PCA = 1.1
PCB = 4.1


def _build_msa(q_seq: np.ndarray, results: List[AlnResult],
               t_seqs: List[np.ndarray]) -> np.ndarray:
    """Query-length MSA rows (uint8, GAP for gaps): query row + one row per
    hit, target residues placed at matched query columns
    (MultipleAlignment semantics — insertions in the target are dropped)."""
    L = len(q_seq)
    rows = [np.asarray(q_seq, dtype=np.uint8)]
    for r, t_seq in zip(results, t_seqs):
        row = np.full(L, GAP, dtype=np.uint8)
        qi, ti = r.q_start, r.t_start
        for op in r.backtrace:
            if op == "M":
                row[qi] = t_seq[ti]
                qi += 1
                ti += 1
            elif op == "I":
                qi += 1
            else:
                ti += 1
        rows.append(row)
    return np.stack(rows)


def compute_pssm_probs(msa: np.ndarray, p_back: np.ndarray,
                       pseudo_counts: np.ndarray,
                       pca: float = PCA, pcb: float = PCB) -> np.ndarray:
    """MSA [K, L] -> per-position probabilities [L, 20]."""
    K, L = msa.shape
    valid = msa != GAP
    counted = valid & (msa < N_AA)

    # Henikoff position-based weights (computeSequenceWeights)
    n_res = valid.sum(axis=1).astype(np.float64)
    w = np.full(K, 1e-6)
    for pos in range(L):
        col = msa[:, pos]
        aa_col = col[counted[:, pos]]
        if len(aa_col) == 0:
            continue
        nl = np.bincount(aa_col, minlength=N_AA)
        distinct = int((nl > 0).sum())
        if distinct == 0:
            continue
        sel = counted[:, pos]
        w[sel] += 1.0 / (nl[col[sel]] * distinct * (n_res[sel] + 30.0))
    w /= w.sum()

    # match weights (computeMatchWeights), normalized with background fallback
    match = np.zeros((L, N_AA))
    for pos in range(L):
        sel = counted[:, pos]
        np.add.at(match[pos], msa[sel, pos], w[sel])
        s = match[pos].sum()
        if s > 0:
            match[pos] /= s
        else:
            match[pos] = p_back[:N_AA] / p_back[:N_AA].sum()

    # Neff (computeNeff_M)
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = -np.where(match > 1e-10, match * np.log2(match, where=match > 0), 0.0).sum(axis=1)
    neff_hmm = float(np.exp2(ent).mean())
    nlim = max(10.0, neff_hmm + 1.0)
    scale = np.log2((nlim - neff_hmm) / (nlim - 1.0))
    w_m = valid.astype(np.float64).T @ w - 1.0 / K
    neff = np.where(w_m < 0, 1.0, nlim - (nlim - 1.0) * np.exp2(scale * w_m))

    # substitution pseudocounts (preparePseudoCounts/computePseudoCounts)
    # pseudo_counts[a, b] = P(a|b): g[pos, a] = sum_b R[a, b] * match[pos, b]
    g = match @ pseudo_counts[:N_AA, :N_AA].T
    tau = np.minimum(1.0, pca / (1.0 + neff / pcb))[:, None]
    return (1.0 - tau) * match + tau * g


def probs_to_scores(probs: np.ndarray, p_back: np.ndarray,
                    bit_factor: float) -> np.ndarray:
    """[L, 20] probabilities -> int32 [21, L] profile (row = target letter),
    X row 0, at the given bit scale (computeLogPSSM semantics)."""
    with np.errstate(divide="ignore"):
        logodds = np.log2(np.maximum(probs, 1e-12) / p_back[None, :N_AA])
    scaled = bit_factor * logodds
    scores = np.where(scaled < 0, scaled - 0.5, scaled + 0.5).astype(np.int32)
    out = np.zeros((21, probs.shape[0]), dtype=np.int32)
    out[:N_AA] = scores.T
    return out


@dataclass
class ProfileEntry:
    key: int
    prob_aa: np.ndarray     # [L, 20]
    prob_ss: np.ndarray     # [L, 20]
    consensus_aa: np.ndarray
    consensus_ss: np.ndarray


def result2profile(qdb: StructDB, tdb: StructDB,
                   results: Dict[int, List[AlnResult]]) -> Dict[int, ProfileEntry]:
    """Build AA+3Di profiles for every query from its alignment results."""
    mb = blosum62()
    m3 = mat3di()
    q_idx = qdb.key_to_index()
    t_idx = tdb.key_to_index()
    out = {}
    for qkey, rs in results.items():
        qi = q_idx[int(qkey)]
        rs = [r for r in rs if r.backtrace]
        t_aa = [np.asarray(tdb.get_aa(t_idx[r.db_key])) for r in rs]
        t_ss = [np.asarray(tdb.get_ss(t_idx[r.db_key])) for r in rs]
        msa_aa = _build_msa(np.asarray(qdb.get_aa(qi)), rs, t_aa)
        msa_ss = _build_msa(np.asarray(qdb.get_ss(qi)), rs, t_ss)
        prob_aa = compute_pssm_probs(msa_aa, mb.p_back, mb.pseudo_counts)
        prob_ss = compute_pssm_probs(msa_ss, m3.p_back, m3.pseudo_counts)
        out[int(qkey)] = ProfileEntry(
            key=int(qkey), prob_aa=prob_aa, prob_ss=prob_ss,
            consensus_aa=np.asarray(qdb.get_aa(qi)).copy(),
            consensus_ss=np.asarray(qdb.get_ss(qi)).copy())
    return out


def save_profile_db(profiles: Dict[int, ProfileEntry], path: str):
    os.makedirs(path, exist_ok=True)
    keys = sorted(profiles)
    np.savez_compressed(
        os.path.join(path, "profiles.npz"),
        keys=np.asarray(keys, dtype=np.int64),
        **{f"paa_{k}": profiles[k].prob_aa for k in keys},
        **{f"pss_{k}": profiles[k].prob_ss for k in keys},
        **{f"caa_{k}": profiles[k].consensus_aa for k in keys},
        **{f"css_{k}": profiles[k].consensus_ss for k in keys})
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"kind": "profile", "n_entries": len(keys)}, f)


def load_profile_db(path: str) -> Dict[int, ProfileEntry]:
    data = np.load(os.path.join(path, "profiles.npz"))
    out = {}
    for k in data["keys"]:
        k = int(k)
        out[k] = ProfileEntry(key=k, prob_aa=data[f"paa_{k}"],
                              prob_ss=data[f"pss_{k}"],
                              consensus_aa=data[f"caa_{k}"],
                              consensus_ss=data[f"css_{k}"])
    return out


class PSSMQueryProfile:
    """QueryProfile-compatible wrapper around per-position PSSM scores —
    reversal flips the profile columns (the reference's profile search has
    no composition bias; StructureSmithWaterman isProfileSearch path)."""

    def __init__(self, q_aa, q_ss, prof_aa, prof_ss,
                 gap_open: int = 10, gap_extend: int = 1):
        self.q_aa = np.asarray(q_aa, dtype=np.int8)
        self.q_ss = np.asarray(q_ss, dtype=np.int8)
        self.L = len(self.q_aa)
        self.gap_open = gap_open
        self.gap_extend = gap_extend
        self.bias_aa = np.zeros(self.L, dtype=np.int8)
        self.bias_ss = np.zeros(self.L, dtype=np.int8)
        self.prof_aa = prof_aa
        self.prof_ss = prof_ss

    def reversed(self) -> "PSSMQueryProfile":
        return PSSMQueryProfile(self.q_aa[::-1].copy(), self.q_ss[::-1].copy(),
                                self.prof_aa[:, ::-1].copy(),
                                self.prof_ss[:, ::-1].copy(),
                                self.gap_open, self.gap_extend)

    flipped = reversed

    def padded(self, lq_pad: int):
        from ..ops.matrices import ALPHA_SIZE
        from ..ops.sw import NEG_INF
        pa = np.full((ALPHA_SIZE, lq_pad), NEG_INF // 4, dtype=np.int32)
        ps = np.full((ALPHA_SIZE, lq_pad), NEG_INF // 4, dtype=np.int32)
        pa[:, : self.L] = self.prof_aa
        ps[:, : self.L] = self.prof_ss
        return pa, ps


def profile_query(entry: ProfileEntry, gap_open: int = 10,
                  gap_extend: int = 1) -> PSSMQueryProfile:
    """Search profile from PSSM probabilities at the 3Di+AA scales
    (2.1 / 1.4, structurealign.cpp:252-265)."""
    mb = blosum62()
    m3 = mat3di()
    return PSSMQueryProfile(
        entry.consensus_aa, entry.consensus_ss,
        probs_to_scores(entry.prob_aa, mb.p_back, 1.4),
        probs_to_scores(entry.prob_ss, m3.p_back, 2.1),
        gap_open, gap_extend)
