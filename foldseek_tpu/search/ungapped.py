"""Ungapped prefilter stage (PREF_MODE_UNGAPPED).

Reference semantics (lib/mmseqs/src/prefiltering/ungappedprefilter.cpp):
  * single alphabet: 3Di seed matrix at bit scale 2.0, scoreBias 0 (:533)
  * query composition bias at scale 0.15 in the foldseek search workflow
    (src/workflow/StructureSearch.cpp:101)
  * score = best ungapped diagonal, byte-saturated at 255 (StripedSW
    ungapped_alignment, StripedSmithWaterman.cpp:1817-1875)
  * keep score > min_ungapped_score (15), top max_seqs by (score desc, key asc)

TPU path: the Pallas gapless kernel scans length-bucketed transposed target
panels resident on device; one kernel launch covers every target bucket.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..db.storage import StructDB
from ..ops.gapless_pallas import (PAD_LETTER, gapless_scores_single,
                                  pack_profile, prepare_targets_T)
from ..ops.matrices import mat3di
from ..ops.sw import calc_comp_bias
from ..utils.log import logger
from .params import SearchParams

MIN_DIAG_SCORE = 15
PREFILTER_BIAS_SCALE = 0.15
BYTE_CAP = 255


class UngappedPrefilter:
    """Holds the device-resident transposed target panels for repeated queries."""

    def __init__(self, tdb: StructDB, lt_pad_multiple: int = 128):
        import jax.numpy as jnp
        self.tdb = tdb
        self.m3 = mat3di(2.0, 0.0)
        from ..db.index import load_index
        idx = load_index(tdb)
        if idx is not None:
            t_T = idx["panel_ss_T"]
            logger.info("ungapped prefilter: using precomputed index panel %s",
                        t_T.shape)
        else:
            lens = tdb.lengths()
            n = tdb.size
            max_len = int(lens.max()) if n else 1
            lt_pad = -(-max_len // lt_pad_multiple) * lt_pad_multiple
            seqs = [tdb.get_ss(i) for i in range(n)]
            t_T = prepare_targets_T(seqs, lens, lt_pad=lt_pad)
        self.t_T = jnp.asarray(t_T)
        self.n_pad = t_T.shape[1]
        self.keys = np.asarray(tdb.keys, dtype=np.int64)

    def query(self, q_ss: np.ndarray, params: SearchParams,
              comp_bias: bool = True) -> List[tuple]:
        """Returns [(target_key, score)] gated + sorted by reference rules."""
        L = len(q_ss)
        prof = self.m3.scores[:, q_ss].astype(np.float32)  # [21, L]
        byte_bias = abs(int(self.m3.scores.min()))
        if comp_bias:
            bias = calc_comp_bias(np.asarray(q_ss), self.m3.scores, self.m3.p_back,
                                  PREFILTER_BIAS_SCALE)
            prof = prof + bias[None, :].astype(np.float32)
            byte_bias += abs(min(int(bias.min()), 0))
        return self._run(prof, byte_bias, params)

    def query_profile(self, prof_ss: np.ndarray, params: SearchParams) -> List[tuple]:
        """Prefilter with a prebuilt [21, L] 3Di profile (profile searches;
        the reference's GPU path feeds the PSSM to Marv the same way,
        ungappedprefilter.cpp:135-199)."""
        prof = np.asarray(prof_ss, dtype=np.float32)
        byte_bias = abs(min(int(prof.min()), 0))
        return self._run(prof, byte_bias, params)

    def _run(self, prof: np.ndarray, byte_bias: int,
             params: SearchParams) -> List[tuple]:
        return self._finish(self._launch(prof, byte_bias), params)

    def _launch(self, prof: np.ndarray, byte_bias: int):
        """Queue the kernel without blocking (async dispatch) so callers can
        launch every query before the first readback."""
        import jax.numpy as jnp
        packed = pack_profile(prof)
        # byte-saturation cap as in the reference's uint8 kernel
        cap = jnp.float32(BYTE_CAP - byte_bias)
        return gapless_scores_single(jnp.asarray(packed), self.t_T, cap)

    def _finish(self, device_scores, params: SearchParams) -> List[tuple]:
        scores = np.asarray(device_scores)
        scores = scores[: self.tdb.size].astype(np.int64)
        ok = scores > MIN_DIAG_SCORE
        idx = np.nonzero(ok)[0]
        order = np.lexsort((self.keys[idx], -scores[idx]))
        idx = idx[order][: params.max_seqs]
        return [(int(self.keys[i]), int(scores[i])) for i in idx]


def ungapped_prefilter(qdb: StructDB, tdb: StructDB,
                       params: SearchParams) -> Dict[int, List[int]]:
    # NOTE: per-query launch+readback measured FASTER here than queueing all
    # launches before draining — the remote-dispatch tunnel degrades when
    # many result buffers are in flight
    pref = UngappedPrefilter(tdb)
    out: Dict[int, List[int]] = {}
    for qi in range(qdb.size):
        hits = pref.query(np.asarray(qdb.get_ss(qi)), params)
        out[int(qdb.keys[qi])] = [k for k, _ in hits]
    logger.info("ungapped prefilter: %d queries, avg %.1f hits",
                qdb.size, np.mean([len(v) for v in out.values()]) if out else 0)
    return out


def ungapped_and_gapped_results(qdb: StructDB, tdb: StructDB,
                                params: SearchParams,
                                same_db: bool) -> Dict[int, List]:
    """--prefilter-mode 3 (PREF_MODE_UNGAPPED_AND_GAPPED): alignment-format
    results straight from the prefilter pass, skipping the alignment module
    (reference: lib/mmseqs/src/prefiltering/ungappedprefilter.cpp:274-291 —
    the GPU path where Marv's gapped SW supplies score+endpos and results
    carry qStart=dbStart=0, the estimated seqId, coverage from the end
    positions alone).

    TPU mapping: the same 3Di-profile (bit scale 2.0 + composition bias)
    drives the Pallas affine SW kernel per query; E-values come from the
    foldseek E-value network (the reference's CPU/GPU mode-3 uses
    Karlin-Altschul statistics of the 3Di matrix — a documented deviation,
    same monotonic ordering)."""
    import jax.numpy as jnp

    from ..nn.evalue import EvalueComputer
    from ..ops.sw_pallas import sw_scores_query
    from .results import AlnResult, compare_hits

    m3 = mat3di(2.0, 0.0)
    ev = EvalueComputer(tdb.total_residues)
    lens = tdb.lengths()
    n = tdb.size
    lt_pad = max(8, 1 << (int(lens.max()) - 1).bit_length()) if n else 8
    b_pad = -(-n // 128) * 128
    t_ss = np.full((b_pad, lt_pad), PAD_LETTER, dtype=np.int32)
    for i in range(n):
        t_ss[i, : lens[i]] = tdb.get_ss(i)
    t_ss_T = jnp.asarray(np.ascontiguousarray(t_ss.T))
    zeros_T = jnp.asarray(np.zeros_like(t_ss.T))
    t_len = jnp.asarray(np.pad(lens, (0, b_pad - n)).astype(np.int32))
    tkeys = np.asarray(tdb.keys, dtype=np.int64)

    out: Dict[int, List] = {}
    for qi in range(qdb.size):
        q_ss = np.asarray(qdb.get_ss(qi))
        L = len(q_ss)
        lq_pad = max(8, 1 << (L - 1).bit_length())
        prof = np.full((21, lq_pad), -1e9, dtype=np.float32)
        prof[:, :L] = m3.scores[:, q_ss].astype(np.float32)
        bias = calc_comp_bias(q_ss, m3.scores, m3.p_back, PREFILTER_BIAS_SCALE)
        prof[:, :L] += bias[None, :].astype(np.float32)
        from ..ops.sw_pallas import pack_sw_profile
        pss = jnp.asarray(pack_sw_profile(prof))
        paa = jnp.asarray(np.full_like(np.asarray(pss), 0.0))
        lam, mu = ev.predict_lambda_mu(q_ss)
        score, q_end, t_end = (np.asarray(x) for x in sw_scores_query(
            paa, pss, zeros_T, t_ss_T, t_len,
            gap_open=params.gap_open, gap_extend=params.gap_extend))
        qkey = int(qdb.keys[qi])
        results = []
        for i in range(n):
            s = int(score[i])
            is_identity = same_db and int(tkeys[i]) == qkey
            if not (is_identity or s > MIN_DIAG_SCORE):
                continue
            qe, te = int(q_end[i]), int(t_end[i])
            q_aln = max(qe, 1)
            t_aln = max(te, 1)
            seq_id = min(1.0, max(0.0, s / float(max(q_aln, t_aln)) * 0.1656
                                  + 0.1141))
            evalue = ev.evalue_corr(s, lam, mu)
            if not is_identity and evalue > params.evalue_thr:
                continue
            results.append(AlnResult(
                db_key=int(tkeys[i]), score=s, seq_id=seq_id, evalue=evalue,
                q_start=0, q_end=qe, q_len=L,
                t_start=0, t_end=te, t_len=int(lens[i]), backtrace=""))
        results.sort(key=compare_hits)
        out[qkey] = results[: params.max_seqs]
    return out
