"""Ungapped prefilter stage (PREF_MODE_UNGAPPED).

Reference semantics (lib/mmseqs/src/prefiltering/ungappedprefilter.cpp):
  * single alphabet: 3Di seed matrix at bit scale 2.0, scoreBias 0 (:533)
  * query composition bias at scale 0.15 in the foldseek search workflow
    (src/workflow/StructureSearch.cpp:101)
  * score = best ungapped diagonal, byte-saturated at 255 (StripedSW
    ungapped_alignment, StripedSmithWaterman.cpp:1817-1875)
  * keep score > min_ungapped_score (15), top max_seqs by (score desc, key asc)

TPU path: queries are stacked into multi-query profile batches and every
length bucket of the target DB is scanned by one Pallas kernel launch over
its transposed int8 panel (db/panels.py). When the padded panels exceed the
device HBM budget, buckets stream through HBM in splits and per-query
candidate lists are merged across splits (the reference's TARGET_DB_SPLIT,
Prefiltering.cpp:289-381).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..db.panels import PanelSet
from ..db.storage import StructDB
from ..ops.gapless_pallas import (PAD_LETTER, gapless_scores_batch,
                                  gapless_scores_single, gapless_topk_batch,
                                  pack_profile, pack_profiles_batch)
from ..ops.matrices import mat3di
from ..ops.sw import calc_comp_bias
from ..utils.log import logger
from .params import SearchParams, can_be_covered_mask

MIN_DIAG_SCORE = 15
PREFILTER_BIAS_SCALE = 0.15
BYTE_CAP = 255
# DP-state rows (q * lq_pad) per kernel launch; see gapless_pallas.MAX_STATE_BYTES
MAX_STACK_ROWS = 3072
# bring full score rows home for small panels; above this row count the
# fused kernel+top-k dispatch returns only [q, k] candidates (measured on
# the remote tunnel: below ~16k rows the readback is not the bottleneck)
DEVICE_TOPK_MIN_ROWS = 16384


# static lq_pad family: stack shapes (and so kernel compiles) stay
# bounded regardless of the query length mix; short stacks are padded
# with dummy all-NEG profiles (score 0, filtered by the gate)
LQ_FAMILY = (128, 256, 384, 512, 768, 1024, 1536, 3072)


def _stack_lq(lq_need: int) -> int:
    for b in LQ_FAMILY:
        if lq_need <= b:
            return b
    return -(-lq_need // 8) * 8  # oversize query: single-query stack


def make_profile_stacks(profs, byte_biases):
    """Group [21, L] query profiles into uniform-lq_pad stacks under the
    kernel's DP-state budget, quantized to the static shape family.
    Returns [(query_indices, prof_stack, caps, q, lq_pad)] device-ready."""
    import jax.numpy as jnp
    groups: Dict[int, list] = {}
    for i, p in enumerate(profs):
        groups.setdefault(_stack_lq(p.shape[1] + 1), []).append(i)
    dummy = np.full((21, 1), -3e8, dtype=np.float32)
    stacks = []
    for lq_pad in sorted(groups):
        idxs = groups[lq_pad]
        q_full = max(1, MAX_STACK_ROWS // lq_pad)
        for i in range(0, len(idxs), q_full):
            grp = idxs[i:i + q_full]
            plist = [profs[g] for g in grp]
            clist = [float(BYTE_CAP - byte_biases[g]) for g in grp]
            while len(plist) < q_full:  # pad to the static stack shape
                plist.append(dummy)
                clist.append(float(BYTE_CAP))
            stack, caps, lq_pad2 = pack_profiles_batch(
                plist, clist, lq_pad=lq_pad)
            assert lq_pad2 == lq_pad
            stacks.append((grp, jnp.asarray(stack), jnp.asarray(caps),
                           q_full, lq_pad))
    return stacks


def make_query_profile(q_ss: np.ndarray, comp_bias: bool = True):
    """[21, L] single-alphabet 3Di prefilter profile + byte bias (the
    running-score saturation offset)."""
    m3 = mat3di(2.0, 0.0)
    q_ss = np.asarray(q_ss)
    prof = m3.scores[:, q_ss].astype(np.float32)
    byte_bias = abs(int(m3.scores.min()))
    if comp_bias:
        bias = calc_comp_bias(q_ss, m3.scores, m3.p_back,
                              PREFILTER_BIAS_SCALE)
        prof = prof + bias[None, :].astype(np.float32)
        byte_bias += abs(min(int(bias.min()), 0))
    return prof, byte_bias


def device_hbm_budget(fraction: float = 0.6) -> Optional[int]:
    """Usable device-memory budget for target panels, or None when the
    backend doesn't report memory (CPU test meshes -> no splitting). The
    reference plans splits from available RAM the same way
    (Prefiltering::setupSplit, Prefiltering.cpp:289-381)."""
    try:
        import jax
        stats = jax.devices()[0].memory_stats()
        limit = stats.get("bytes_limit") if stats else None
        if limit:
            return int(limit * fraction)
    except Exception:
        pass
    return None


class UngappedPrefilter:
    """Bucketed, device-resident target panels scanned for query batches."""

    def __init__(self, tdb: StructDB, budget_bytes: Optional[int] = None):
        self.tdb = tdb
        self.m3 = mat3di(2.0, 0.0)
        if budget_bytes is None:
            budget_bytes = device_hbm_budget()
        self.panels = PanelSet.from_db(tdb, budget_bytes)
        self.keys = np.asarray(tdb.keys, dtype=np.int64)
        self.tlens = np.asarray(tdb.lengths(), dtype=np.int64)
        # device top-k breaks score ties by panel row; that matches the
        # host lexsort((key, -score)) tie order only when keys ascend with
        # entry order (true for createdb output; subdbs may differ) —
        # otherwise a tied smaller-key hit past k could be dropped, so the
        # per-piece top-k path is disabled then
        self.keys_monotonic = bool(np.all(np.diff(self.keys) >= 0))
        logger.info(
            "ungapped prefilter: %d buckets (lt %s), %.1f MB device panels, "
            "%d splits", len(self.panels.buckets),
            [b.lt_pad for b in self.panels.buckets],
            self.panels.total_bytes / 1e6, len(self.panels.splits))

    # --- profile construction -------------------------------------------
    def _profile(self, q_ss: np.ndarray, comp_bias: bool = True):
        return make_query_profile(q_ss, comp_bias)

    # --- public API ------------------------------------------------------
    def query(self, q_ss: np.ndarray, params: SearchParams,
              comp_bias: bool = True) -> List[tuple]:
        """[(target_key, score)] gated + sorted by reference rules."""
        return self.query_batch([q_ss], params, comp_bias=comp_bias)[0]

    def query_profile(self, prof_ss: np.ndarray,
                      params: SearchParams) -> List[tuple]:
        """Prefilter with a prebuilt [21, L] 3Di profile (profile searches;
        the reference's GPU path feeds the PSSM to Marv the same way,
        ungappedprefilter.cpp:135-199)."""
        prof = np.asarray(prof_ss, dtype=np.float32)
        byte_bias = abs(min(int(prof.min()), 0))
        return self._run_batch([prof], [byte_bias], params)[0]

    def query_batch(self, seqs: Sequence[np.ndarray], params: SearchParams,
                    comp_bias: bool = True) -> List[List[tuple]]:
        """Batch variant: one kernel launch scores a whole query stack
        against each target bucket."""
        profs, biases = [], []
        for q_ss in seqs:
            p, b = self._profile(q_ss, comp_bias)
            profs.append(p)
            biases.append(b)
        return self._run_batch(profs, biases, params)

    # --- execution -------------------------------------------------------
    def _make_stacks(self, profs, byte_biases):
        return make_profile_stacks(profs, byte_biases)

    def _run_batch(self, profs, byte_biases, params: SearchParams):
        import jax
        import jax.numpy as jnp

        # queries too tall for the stacked kernel's VMEM state take the
        # row-block-chained long path (gapless_scores_long)
        normal = [i for i, p in enumerate(profs)
                  if p.shape[1] + 1 <= LQ_FAMILY[-1]]
        long_q = [i for i in range(len(profs)) if i not in set(normal)]
        stacks = self._make_stacks([profs[i] for i in normal],
                                   [byte_biases[i] for i in normal])
        stacks = [([normal[g] for g in grp], stack, caps, q, lq)
                  for grp, stack, caps, q, lq in stacks]
        nq = len(profs)
        cand_scores = [[] for _ in range(nq)]
        cand_idx = [[] for _ in range(nq)]
        multi_split = len(self.panels.splits) > 1

        for split in self.panels.splits:
            for piece in split:
                bucket = self.panels.buckets[piece.bucket]
                t_dev = self.panels.device_panel(piece, keep=not multi_split)
                rows = piece.row_end - piece.row_start
                n_real = min(bucket.n, piece.row_end) - piece.row_start
                if n_real <= 0:
                    continue
                entry_idx = bucket.entry_idx[
                    piece.row_start: piece.row_start + n_real]
                pending = []
                use_topk = self.keys_monotonic and rows >= max(
                    DEVICE_TOPK_MIN_ROWS, 2 * params.max_seqs)
                for grp, stack, caps, q, lq_pad in stacks:
                    if use_topk:
                        k = min(rows, params.max_seqs)
                        top_s, top_i = gapless_topk_batch(
                            stack, t_dev, caps, q, lq_pad, k)
                        pending.append(("topk", grp, top_s, top_i))
                    else:
                        scores = gapless_scores_batch(stack, t_dev, caps,
                                                      q, lq_pad)
                        pending.append(("all", grp, scores, None))
                for g in long_q:
                    from ..ops.gapless_pallas import gapless_scores_long
                    pending.append(("long", [g], gapless_scores_long(
                        pack_profile(profs[g]), t_dev,
                        float(BYTE_CAP - byte_biases[g])), None))
                # one concatenated readback per piece: each np.asarray of a
                # device array is a blocking round trip on remote-dispatch
                # backends (align.py _drain_outputs rationale); the panel
                # itself can be released right after, preserving the HBM
                # split-streaming budget
                from .align import _drain_outputs
                flat_in = []
                for _, _, s_dev, i_dev in pending:
                    flat_in.append(s_dev)
                    if i_dev is not None:
                        flat_in.append(i_dev)
                drained = iter(_drain_outputs(flat_in))
                for kind, grp, s_dev, i_dev in pending:
                    s = next(drained)
                    if kind == "long":
                        cand_scores[grp[0]].append(s[:n_real])
                        cand_idx[grp[0]].append(entry_idx)
                    elif kind == "topk":
                        ti = next(drained).astype(np.int64)
                        for r, g in enumerate(grp):
                            ok = ti[r] < n_real
                            cand_scores[g].append(s[r][ok])
                            cand_idx[g].append(entry_idx[ti[r][ok]])
                    else:
                        for r, g in enumerate(grp):
                            cand_scores[g].append(s[r][:n_real])
                            cand_idx[g].append(entry_idx)

        out = []
        for g in range(nq):
            if cand_scores[g]:
                s = np.concatenate(cand_scores[g]).astype(np.int64)
                idx = np.concatenate(cand_idx[g])
            else:
                s = np.zeros(0, dtype=np.int64)
                idx = np.zeros(0, dtype=np.int64)
            ok = s > MIN_DIAG_SCORE
            if params.cov_thr > 0.0:
                # Util::canBeCovered length pre-gate
                # (ungappedprefilter.cpp:403 applies it per target before
                # scoring; host-side masking before the final top-k keeps
                # the same surviving set)
                qlen = profs[g].shape[1]
                ok &= can_be_covered_mask(params.cov_thr, params.cov_mode,
                                          qlen, self.tlens[idx])
            s, idx = s[ok], idx[ok]
            order = np.lexsort((self.keys[idx], -s))[: params.max_seqs]
            out.append([(int(self.keys[idx[i]]), int(s[i])) for i in order])
        return out


_pref_cache: dict = {}  # tdb.path -> UngappedPrefilter (resident panels)


def resident_prefilter(tdb: StructDB) -> "UngappedPrefilter":
    """Per-process resident UngappedPrefilter keyed by DB path — repeated
    searches against the same target DB reuse the device panels instead of
    re-uploading (the gpuserver-resident-DB analogue in-process,
    lib/mmseqs/src/util/gpuserver.cpp; the cross-process version is
    server.py's indexserver)."""
    # key on the loaded array object identity, not just the path: a DB
    # regenerated and reloaded under the same path gets fresh panels
    key = (getattr(tdb, "path", None), id(tdb.ss), tdb.size)
    pref = _pref_cache.get(key)
    if pref is None:
        pref = UngappedPrefilter(tdb)
        _pref_cache.clear()  # one resident DB (HBM budget)
        _pref_cache[key] = pref
    return pref


def ungapped_prefilter(qdb: StructDB, tdb: StructDB,
                       params: SearchParams) -> Dict[int, List[int]]:
    pref = resident_prefilter(tdb)
    seqs = [np.asarray(qdb.get_ss(qi)) for qi in range(qdb.size)]
    hits = pref.query_batch(seqs, params)
    out: Dict[int, List[int]] = {
        int(qdb.keys[qi]): [k for k, _ in hits[qi]]
        for qi in range(qdb.size)}
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
