"""structurealign: dual-alphabet gapped alignment stage.

Mirrors the reference driver (reference: src/strucclustutils/structurealign.cpp:
alignStructure :37-112, main loop :318-453): per query build forward +
reversed profiles, score every prefilter candidate (device, batched), gate by
E-value with the reversed-query score subtraction, recover backtraces on the
host for survivors, apply TM-score / LDDT gates, scale the score by
sqrt(lddt * tm) when sorting by structure bits, sort and emit.

TPU mapping: the two score passes (forward + reversed query) run as
multi-query stacked Pallas SW kernels over length-bucketed padded targets
(ops/sw_pallas.py sw_scores_batch); everything per surviving hit
(backtrace, Kabsch/TM iterations, LDDT) runs on the host in the native
library under a thread pool (the reference's omp-for shape).
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence

import numpy as np

from ..db.storage import StructDB
from ..nn.evalue import EvalueComputer
from ..ops import backtrace as bt_ops
from ..ops import lddt as lddt_ops
from ..ops import tmscore as tm_ops
from ..ops.sw import QueryProfile
from ..utils.log import logger
from .params import (SearchParams, can_be_covered, can_be_covered_mask,
                     has_coverage)
from .results import AlnResult, compare_hits, compare_hits_by_structure_bits


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _pack_targets(tdb, tks, tkey_to_idx, t_lens, lt_pad, b_multiple=128):
    """Padded [b_pad, lt_pad] int8 AA/3Di panels + lengths for a candidate
    list, built with vectorized gathers — the per-target slice-assignment
    loop was ~30 s of pure python at a 64k-pair fleet."""
    n = len(tks)
    # coarse 4x batch-padding family ({128, 512, 2048, 8192, ...}): b_pad
    # is a kernel shape dimension, and free multiples of 128 gave the
    # cluster cascade 300+ distinct executables (~0.8 s per-process load
    # each on the remote backend); pad compute/transfer is noise next to
    # launch overhead (int8 panels)
    b_pad = b_multiple if b_multiple > 1 else 1
    while b_pad < n:
        b_pad *= 4
    # int8 panels: the device kernels want int32, but the H2D transfer is
    # 4x smaller shipped as int8 with an on-device upcast (the tunnel's
    # ~46 MB/s made the int32 panels ~0.5 s of the SW stage)
    t_aa = np.full((b_pad, lt_pad), 21, dtype=np.int8)
    t_ss = np.full((b_pad, lt_pad), 21, dtype=np.int8)
    t_len = np.zeros(b_pad, dtype=np.int32)
    if n == 0:
        return t_aa, t_ss, t_len
    idx = np.fromiter((tkey_to_idx[tk] for tk in tks), dtype=np.int64,
                      count=n)
    lens = np.minimum(
        np.fromiter((t_lens[tk] for tk in tks), dtype=np.int64, count=n),
        lt_pad)
    offs = np.asarray(tdb.offsets)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    total = int(lens.sum())
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    col = np.arange(total, dtype=np.int64) - starts[row]
    src = offs[idx][row] + col
    t_aa[row, col] = np.asarray(tdb.aa)[src]
    t_ss[row, col] = np.asarray(tdb.ss)[src]
    t_len[:n] = lens
    return t_aa, t_ss, t_len


def _drain_outputs(pending_arrays):
    """Fetch many device arrays with ONE host round trip.

    Each np.asarray(device_array) blocks on its own D2H transfer; on a
    remote-dispatch backend that is a full round trip per array (measured
    ~44 ms each — 27 of them dominated the align stage). Concatenating the
    raveled outputs on device and reading back once turns N round trips
    into 1."""
    import jax.numpy as jnp
    if not pending_arrays:
        return []
    # one concatenated transfer per distinct dtype (usually 1-2)
    groups: dict = {}
    for i, a in enumerate(pending_arrays):
        groups.setdefault(str(a.dtype), []).append(i)
    out = [None] * len(pending_arrays)
    for idxs in groups.values():
        allflat = np.asarray(
            jnp.concatenate([pending_arrays[i].ravel() for i in idxs]))
        off = 0
        for i in idxs:
            a = pending_arrays[i]
            out[i] = allflat[off:off + a.size].reshape(a.shape)
            off += a.size
    return out


class PairScorer:
    """All-pairs batched SW scoring: every (query, candidate) pair of the
    whole stage goes to the device in a handful of launches.

    On TPU, queries are stacked — each query contributes its forward AND
    reversed profile as two adjacent slots of a multi-query SW kernel stack
    (ops/sw_pallas.py sw_scores_batch, segmented affine F), and each stack
    scans the union of its queries' candidates per power-of-2 target-length
    bucket. This cuts launches from 2 x queries x buckets to
    ~2 x buckets per stack of ~8 queries — on a remote-dispatch backend the
    per-launch round-trips dominated the stage."""

    # static lq_pad family bounds kernel compiles; > max: per-query fallback.
    # A stack always holds at least one fwd+rev pair (2 * lq_pad rows), so
    # the family tops out at SW_MAX_STACK_ROWS / 2 — 2048-row SW states
    # overflow the 16 MB scoped VMEM (measured).
    # The COARSE target-length family ({64,256,1024,2048}) is the default
    # since r4: every distinct (lq, lt, b) shape is its own executable, and
    # per-process executable loads cost ~0.8 s each on the remote backend —
    # the cluster cascade's shape diversity paid ~190 s of loads under the
    # fine family. Pad compute is noise next to launch overhead.
    # FOLDSEEK_TPU_SW_FINE=1 restores the tight pow2 family.
    SW_LQ_FAMILY = (128, 256, 384, 512, 768)
    SW_LQ_FAMILY_COARSE = (128, 384, 768)
    SW_MAX_STACK_ROWS = 1536
    SW_LT_FAMILY_COARSE = (64, 256, 1024, 2048)

    @classmethod
    def _coarse(cls) -> bool:
        import os
        return os.environ.get("FOLDSEEK_TPU_SW_FINE", "") != "1"

    @classmethod
    def _sw_lt(cls, lt_need: int) -> int:
        if cls._coarse():
            for b in cls.SW_LT_FAMILY_COARSE:
                if lt_need <= b:
                    return b
        return max(8, _next_pow2(lt_need))

    def __init__(self, qdb: StructDB, tdb: StructDB, params: SearchParams,
                 prefilter: Dict[int, Sequence[int]], qkey_to_idx, tkey_to_idx,
                 query_profiles: Dict[int, object] = None):
        import jax.numpy as jnp

        # per-query result arrays aligned to the candidate order:
        # qkey -> (fwd, qend, tend, rev) int64 arrays
        self.per_query: Dict[int, tuple] = {}
        pairs = []  # (qkey, tkey)
        for qkey, cands in prefilter.items():
            for tkey in cands:
                pairs.append((int(qkey), int(tkey)))
        profs: Dict[int, QueryProfile] = {}
        rprofs: Dict[int, QueryProfile] = {}
        self.profs = profs
        self.rprofs = rprofs
        if not pairs:
            # every candidate list empty (e.g. all gated away): no device
            # work, but align_query still looks profiles up per query
            for qkey in prefilter:
                if query_profiles is not None:
                    profs[int(qkey)] = query_profiles[int(qkey)]
                else:
                    qi = qkey_to_idx[int(qkey)]
                    profs[int(qkey)] = QueryProfile(
                        np.asarray(qdb.get_aa(qi)), np.asarray(qdb.get_ss(qi)),
                        comp_bias_correction=params.comp_bias_correction,
                        comp_bias_scale=params.comp_bias_correction_scale,
                        gap_open=params.gap_open,
                        gap_extend=params.gap_extend,
                        with_aa=params.alignment_type != 0)
            return
        for qkey in prefilter:
            if query_profiles is not None:
                prof = query_profiles[int(qkey)]
            else:
                qi = qkey_to_idx[int(qkey)]
                prof = QueryProfile(
                    np.asarray(qdb.get_aa(qi)), np.asarray(qdb.get_ss(qi)),
                    comp_bias_correction=params.comp_bias_correction,
                    comp_bias_scale=params.comp_bias_correction_scale,
                    gap_open=params.gap_open, gap_extend=params.gap_extend,
                    with_aa=params.alignment_type != 0)
            profs[int(qkey)] = prof
            rprofs[int(qkey)] = prof.reversed()
        self.profs = profs
        self.rprofs = rprofs

        import jax
        on_tpu = jax.default_backend() == "tpu"
        t_lens = {tk: tdb.entry_len(tkey_to_idx[tk]) for _, tk in pairs}
        cand_by_q: Dict[int, list] = {}
        for qk, tk in pairs:
            cand_by_q.setdefault(qk, []).append(tk)

        if on_tpu:
            self._score_stacked(tdb, params, cand_by_q, t_lens, tkey_to_idx)
        else:
            self._score_xla(tdb, params, cand_by_q, t_lens, tkey_to_idx)

    @classmethod
    def _sw_lq(cls, lq_need: int):
        fam = cls.SW_LQ_FAMILY_COARSE if cls._coarse() else cls.SW_LQ_FAMILY
        for b in fam:
            if lq_need <= b:
                return b
        return None

    def _score_stacked(self, tdb, params, cand_by_q, t_lens, tkey_to_idx):
        import jax.numpy as jnp

        from ..ops.sw_pallas import (pack_sw_profile, pack_sw_profiles_batch,
                                     sw_scores_query)

        # group queries by lq family; oversize queries take the single path
        fam: Dict[int, list] = {}
        single: list = []
        for qk in cand_by_q:
            b = self._sw_lq(self.profs[qk].L + 1)
            if b is None:
                single.append(qk)
            else:
                fam.setdefault(b, []).append(qk)

        dummy = np.full((21, 1), -1e9, dtype=np.float32)
        # phase 1: per-stack host data (profiles packed, candidate unions
        # bucketed by target length) — no device work yet
        stack_entries = []  # (lq_pad, per_stack, grp, paa, pss, ra, rs, buckets)
        for lq_pad, qks in sorted(fam.items()):
            per_stack = max(1, self.SW_MAX_STACK_ROWS // lq_pad // 2)
            for s0 in range(0, len(qks), per_stack):
                grp = qks[s0:s0 + per_stack]
                # interleave fwd/rev profiles; pad to the static slot count
                plist_aa, plist_ss = [], []
                for qk in grp:
                    fpa, fps = self.profs[qk].padded(self.profs[qk].L)
                    rpa, rps = self.rprofs[qk].padded(self.rprofs[qk].L)
                    plist_aa += [fpa, rpa]
                    plist_ss += [fps, rps]
                while len(plist_aa) < 2 * per_stack:
                    plist_aa.append(dummy)
                    plist_ss.append(dummy)
                paa, pss, radd, rsub = pack_sw_profiles_batch(
                    plist_aa, plist_ss, lq_pad,
                    gap_open=params.gap_open, gap_extend=params.gap_extend)
                buckets: Dict[int, list] = {}
                seen = set()
                for qk in grp:
                    for tk in cand_by_q[qk]:
                        if tk not in seen:
                            seen.add(tk)
                            lt_pad = self._sw_lt(t_lens[tk])
                            buckets.setdefault(lt_pad, []).append(tk)
                stack_entries.append((lq_pad, per_stack, grp, paa, pss,
                                      radd, rsub, buckets))

        # phase 2: group (stack, lt bucket) pairs by (lq_pad, lt_pad, B)
        # and run each group as ONE multi-stack launch — the cluster
        # cascade's many-query-few-candidate shape ran ~4000 per-stack
        # launches (~100 s of per-launch overhead + ~50 s of device_puts
        # on the remote backend); grouped, a cascade step is a handful
        def _b_quant(n):
            b = 128
            while b < n:
                b *= 4
            return b

        from ..ops.sw_pallas import sw_scores_batch_multi
        groups: Dict[tuple, list] = {}
        for ei, (lq_pad, per_stack, grp, paa, pss, radd, rsub,
                 buckets) in enumerate(stack_entries):
            for lt_pad, tks in sorted(buckets.items()):
                key = (lq_pad, per_stack, lt_pad, _b_quant(len(tks)))
                groups.setdefault(key, []).append((ei, tks))

        S_MAX = 256  # stacks per launch: bounds the profile block to ~50 MB

        def _s_quant(n):
            # stack-count family {1,2,4,8,16,64,256}: S is part of the
            # executable's grid, so it must be quantized — but the family
            # must start at 1: r4 quantized S with _b_quant (minimum 128),
            # so the common 16-query search padded ~8 real stacks to 128,
            # allocating ~600 MB of inert np.full profile/target panels and
            # shipping them H2D EVERY rep (74 s host fill + 28 s transfer
            # per rep in the 100k profile — the "still descending" reps the
            # r4 driver bench recorded)
            for b in (1, 2, 4, 8, 16, 64, 256):
                if n <= b:
                    return b
            return 256

        multi_pending = []  # (chunk members, q, device outputs)
        import jax
        for (lq_pad, per_stack, lt_pad, Bq), members in sorted(groups.items()):
            q = 2 * per_stack
            rows = q * lq_pad
            lanes = stack_entries[members[0][0]][3].shape[1]
            for m0 in range(0, len(members), S_MAX):
                chunk = members[m0:m0 + S_MAX]
                S = _s_quant(len(chunk))
                paa_all = np.full((S * rows, lanes), -1e9, dtype=np.float32)
                pss_all = np.full((S * rows, lanes), -1e9, dtype=np.float32)
                ra_all = np.zeros((S * rows, 1), dtype=np.float32)
                rs_all = np.zeros((S * rows, 1), dtype=np.float32)
                tA_all = np.full((S * lt_pad, Bq), 21, dtype=np.int8)
                tS_all = np.full((S * lt_pad, Bq), 21, dtype=np.int8)
                tl_all = np.zeros((S, Bq), dtype=np.int32)
                for j, (ei, tks) in enumerate(chunk):
                    _, _, _, paa, pss, radd, rsub, _ = stack_entries[ei]
                    paa_all[j * rows:(j + 1) * rows] = paa
                    pss_all[j * rows:(j + 1) * rows] = pss
                    ra_all[j * rows:(j + 1) * rows] = radd
                    rs_all[j * rows:(j + 1) * rows] = rsub
                    t_aa, t_ss, t_len = _pack_targets(
                        tdb, tks, tkey_to_idx, t_lens, lt_pad,
                        b_multiple=Bq)
                    tA_all[j * lt_pad:(j + 1) * lt_pad] = t_aa.T[:, :Bq]
                    tS_all[j * lt_pad:(j + 1) * lt_pad] = t_ss.T[:, :Bq]
                    tl_all[j] = t_len[:Bq]
                paa_d, pss_d, ra_d, rs_d, tA_d, tS_d, tl_d = jax.device_put(
                    (paa_all, pss_all, ra_all, rs_all, tA_all, tS_all,
                     tl_all))
                out = sw_scores_batch_multi(
                    paa_d, pss_d, ra_d, rs_d, tA_d, tS_d,
                    tl_d, S, q, lq_pad,
                    gap_open=params.gap_open, gap_extend=params.gap_extend)
                multi_pending.append((chunk, q, out))
        # one drain for every group's outputs, then host-side unpacking
        # into the per-(stack, bucket) records the query loop consumes
        drained_multi = _drain_outputs(
            [x for _, _, out in multi_pending for x in out])
        pending = []
        for gi, (chunk, q, _) in enumerate(multi_pending):
            sc_all, qe_all, te_all = drained_multi[3 * gi: 3 * gi + 3]
            for j, (ei, tks) in enumerate(chunk):
                grp = stack_entries[ei][2]
                pending.append((grp, tks,
                                (sc_all[j * q:(j + 1) * q],
                                 qe_all[j * q:(j + 1) * q],
                                 te_all[j * q:(j + 1) * q])))
        # results land in per-query arrays aligned to the candidate order
        # (vectorized gathers instead of 4 dict stores per pair)
        by_query: Dict[int, list] = {}  # qk -> [(col_map, sc, qe, te, r)]
        for grp, tks, (sc, qe, te) in pending:
            col = {tk: i for i, tk in enumerate(tks)}
            for r, qk in enumerate(grp):
                by_query.setdefault(qk, []).append((col, sc, qe, te, r))
        for qk, blocks in by_query.items():
            cands = cand_by_q[qk]
            n = len(cands)
            fwd = np.zeros(n, np.int64)
            qend = np.zeros(n, np.int64)
            tend = np.zeros(n, np.int64)
            rev = np.zeros(n, np.int64)
            for col, sc, qe, te, r in blocks:
                idx_c = [(i, col[tk]) for i, tk in enumerate(cands)
                         if tk in col]
                if not idx_c:
                    continue
                ii = np.fromiter((a for a, _ in idx_c), np.int64,
                                 len(idx_c))
                cc = np.fromiter((b for _, b in idx_c), np.int64,
                                 len(idx_c))
                fwd[ii] = sc[2 * r][cc]
                qend[ii] = qe[2 * r][cc]
                tend[ii] = te[2 * r][cc]
                rev[ii] = sc[2 * r + 1][cc]
            self.per_query[qk] = (fwd, qend, tend, rev)

        # oversize queries: per-query single-profile launches; queries too
        # tall even for a single-profile VMEM state score on the host
        # (rare — the numpy column scorer handles any length)
        from ..ops.sw import sw_score_endpos_np
        very_long = [qk for qk in single if self.profs[qk].L > 2048]
        for qk in very_long:
            prof, rprof = self.profs[qk], self.rprofs[qk]
            fpa, fps = prof.padded(prof.L)
            rpa, rps = rprof.padded(prof.L)
            cands = cand_by_q[qk]
            arrs = tuple(np.zeros(len(cands), np.int64) for _ in range(4))
            for i, tk in enumerate(cands):
                ti = tkey_to_idx[tk]
                t_aa = np.asarray(tdb.get_aa(ti), dtype=np.int64)
                t_ss = np.asarray(tdb.get_ss(ti), dtype=np.int64)
                fsc, fqe, fte = sw_score_endpos_np(
                    fpa, fps, t_aa, t_ss,
                    gap_open=params.gap_open, gap_extend=params.gap_extend)
                rsc, _, _ = sw_score_endpos_np(
                    rpa, rps, t_aa, t_ss,
                    gap_open=params.gap_open, gap_extend=params.gap_extend)
                arrs[0][i], arrs[1][i] = int(fsc), int(fqe)
                arrs[2][i], arrs[3][i] = int(fte), int(rsc)
            self.per_query[qk] = arrs
        single = [qk for qk in single if qk not in set(very_long)]

        pending = []
        for qk in single:
            prof, rprof = self.profs[qk], self.rprofs[qk]
            lq_pad = max(8, _next_pow2(prof.L))
            fpa, fps = prof.padded(lq_pad)
            rpa, rps = rprof.padded(lq_pad)
            fa, fs_ = jnp.asarray(pack_sw_profile(fpa)), jnp.asarray(pack_sw_profile(fps))
            ra, rs_ = jnp.asarray(pack_sw_profile(rpa)), jnp.asarray(pack_sw_profile(rps))
            buckets: Dict[int, list] = {}
            for tk in cand_by_q[qk]:
                buckets.setdefault(self._sw_lt(t_lens[tk]), []).append(tk)
            for lt_pad, tks in sorted(buckets.items()):
                t_aa, t_ss, t_len = _pack_targets(tdb, tks, tkey_to_idx,
                                                  t_lens, lt_pad)
                ta = jnp.asarray(np.ascontiguousarray(t_aa.T)).astype(jnp.int32)
                ts = jnp.asarray(np.ascontiguousarray(t_ss.T)).astype(jnp.int32)
                tl = jnp.asarray(t_len)
                fwd = sw_scores_query(fa, fs_, ta, ts, tl,
                                      gap_open=params.gap_open,
                                      gap_extend=params.gap_extend)
                rev = sw_scores_query(ra, rs_, ta, ts, tl,
                                      gap_open=params.gap_open,
                                      gap_extend=params.gap_extend)
                pending.append((qk, tks, fwd, rev))
        drained = _drain_outputs(
            [x for _, _, fwd, rev in pending for x in (*fwd, rev[0])])
        by_query = {}
        for j, (qk, tks, _, _) in enumerate(pending):
            by_query.setdefault(qk, []).append(
                (tks,) + tuple(drained[4 * j: 4 * j + 4]))
        for qk, blocks in by_query.items():
            cands = cand_by_q[qk]
            arrs = tuple(np.zeros(len(cands), np.int64) for _ in range(4))
            for tks, fsc, fqe, fte, rsc in blocks:
                col = {tk: j for j, tk in enumerate(tks)}
                # iterate candidate positions (not tks) so duplicate
                # candidate keys each get their value
                idx_c = [(i, col[tk]) for i, tk in enumerate(cands)
                         if tk in col]
                ii = np.fromiter((a for a, _ in idx_c), np.int64, len(idx_c))
                cc = np.fromiter((b for _, b in idx_c), np.int64, len(idx_c))
                arrs[0][ii], arrs[1][ii] = fsc[cc], fqe[cc]
                arrs[2][ii], arrs[3][ii] = fte[cc], rsc[cc]
            self.per_query[qk] = arrs

    def _score_xla(self, tdb, params, cand_by_q, t_lens, tkey_to_idx):
        """Off-TPU (test meshes): the XLA scan path — the Pallas interpreter
        is an order of magnitude slower than XLA:CPU."""
        import jax.numpy as jnp

        from ..ops.sw import sw_score_endpos

        lq_pad = max(8, _next_pow2(max(p.L for p in self.profs.values())))
        pending = []
        for qk, tks_all in cand_by_q.items():
            groups: Dict[int, list] = {}
            for tk in tks_all:
                groups.setdefault(max(8, _next_pow2(t_lens[tk])), []).append(tk)
            fpa, fps = self.profs[qk].padded(lq_pad)
            rpa, rps = self.rprofs[qk].padded(lq_pad)
            for lt_pad, tks in sorted(groups.items()):
                t_aa, t_ss, t_len = _pack_targets(tdb, tks, tkey_to_idx,
                                                  t_lens, lt_pad,
                                                  b_multiple=1)
                ta = jnp.asarray(t_aa).astype(jnp.int32)
                ts = jnp.asarray(t_ss).astype(jnp.int32)
                tl = jnp.asarray(t_len)
                fwd = sw_score_endpos(jnp.asarray(fpa), jnp.asarray(fps), ta, ts, tl,
                                      gap_open=params.gap_open,
                                      gap_extend=params.gap_extend)
                rev = sw_score_endpos(jnp.asarray(rpa), jnp.asarray(rps), ta, ts, tl,
                                      gap_open=params.gap_open,
                                      gap_extend=params.gap_extend)
                pending.append((qk, tks, fwd, rev))
        by_query: Dict[int, list] = {}
        for qk, tks, fwd, rev in pending:
            fsc, fqe, fte = (np.asarray(x) for x in fwd)
            rsc = np.asarray(rev[0])
            by_query.setdefault(qk, []).append((tks, fsc, fqe, fte, rsc))
        for qk, blocks in by_query.items():
            cands = cand_by_q[qk]
            arrs = tuple(np.zeros(len(cands), np.int64) for _ in range(4))
            for tks, fsc, fqe, fte, rsc in blocks:
                col = {tk: j for j, tk in enumerate(tks)}
                # iterate candidate positions (not tks) so duplicate
                # candidate keys each get their value
                idx_c = [(i, col[tk]) for i, tk in enumerate(cands)
                         if tk in col]
                ii = np.fromiter((a for a, _ in idx_c), np.int64, len(idx_c))
                cc = np.fromiter((b for _, b in idx_c), np.int64, len(idx_c))
                arrs[0][ii], arrs[1][ii] = fsc[cc], fqe[cc]
                arrs[2][ii], arrs[3][ii] = fte[cc], rsc[cc]
            self.per_query[qk] = arrs


def align_all(qdb: StructDB, tdb: StructDB,
              prefilter: Dict[int, Sequence[int]],
              params: SearchParams,
              same_db: bool = False,
              query_profiles: Dict[int, object] = None) -> Dict[int, List[AlnResult]]:
    """Run the alignment stage for every query.

    prefilter: query key -> ordered candidate target keys.
    query_profiles: optional prebuilt PSSM profiles (iterative search).
    Returns query key -> sorted AlnResult list.
    """
    import time as _time
    ev = EvalueComputer(tdb.total_residues)
    tkey_to_idx = tdb.key_to_index()
    qkey_to_idx = qdb.key_to_index()
    _t0 = _time.perf_counter()
    scorer = PairScorer(qdb, tdb, params, prefilter, qkey_to_idx, tkey_to_idx,
                        query_profiles=query_profiles)
    from ..utils.log import record_stage as _rec
    _rec("sw_scoring", _time.perf_counter() - _t0)
    logger.debug("align: SW pair scoring %.2fs",
                 _time.perf_counter() - _t0)

    need_tm = params.tmscore_threshold > 0 or params.sort_by_structure_bits
    need_lddt = params.lddt_threshold > 0 or params.sort_by_structure_bits
    need_ca = (need_tm or need_lddt) and qdb.ca is not None and tdb.ca is not None
    if (need_tm or need_lddt) and not need_ca:
        logger.warning("C-alpha data missing; disabling structure bits/TM/LDDT gates")
        need_tm = need_lddt = False
        params.sort_by_structure_bits = False

    # thread-parallel over queries (the reference's omp-for,
    # structurealign.cpp:318); per-hit backtrace/TM/LDDT run in the native
    # lib which releases the GIL
    from ..utils.hostpar import map_queries

    # device survivor gating (structurealign.cpp:377-407 on TPU): when TM
    # and LDDT are pure scoring inputs (thresholds 0 — the default
    # structure-bit path), the accept/reject loop is independent of their
    # values, so phase A runs gates+backtraces on host threads and phase B
    # computes TM+LDDT for the whole survivor fleet in a few batched device
    # launches. Host per-hit native calls remain the parity path off-TPU
    # and for small fleets / active TM/LDDT thresholds.
    import os

    import jax
    gate_env = os.environ.get("FOLDSEEK_TPU_DEVICE_GATES", "")
    # crossover measured on SCOP ava (672 pairs): host native TM+LDDT
    # ~0.8 ms/pair on one core beats the batched device path's fixed
    # launch+readback cost; fleets amortize it and free the host core
    gate_min = 4096 if gate_env == "" else (0 if gate_env == "1" else 1 << 62)
    # TM/LDDT as pure scoring inputs (thresholds 0, no alt-ali): the
    # accept/reject loop is independent of their values, so they can be
    # computed after the loop — on device for TPU fleets, else in one
    # batched native call per query (native batch_gates; identical C code
    # to the inline per-hit path, so results are bit-identical)
    can_defer = (
        (need_tm or need_lddt)
        and params.tmscore_threshold <= 0 and params.lddt_threshold <= 0
        and params.alt_alignment == 0)
    defer_gates = (
        can_defer and gate_env != "0"
        # env "1" forces the device path even off-TPU (tests/debug)
        and (jax.default_backend() == "tpu" or gate_env == "1")
        and sum(len(v) for v in prefilter.values()) >= gate_min)
    if defer_gates:
        gates_mode = "device"
    elif (can_defer
          and os.environ.get("FOLDSEEK_TPU_HOST_BATCH_GATES", "1") != "0"):
        from .. import native as _native
        gates_mode = "host" if _native.get_lib() is not None else "inline"
    else:
        gates_mode = "inline"

    def one(qkey_cands):
        qkey, cand_keys = qkey_cands
        qi = qkey_to_idx[int(qkey)]
        return int(qkey), align_query(
            qi, qdb, tdb, cand_keys, params, ev, scorer, tkey_to_idx,
            need_tm=need_tm, need_lddt=need_lddt, same_db=same_db,
            gates_mode=gates_mode)

    _t0 = _time.perf_counter()
    if defer_gates:
        # wave-pipelined phases: dispatch each wave's TM/LDDT fleets as
        # soon as its backtraces exist, so the device computes wave k
        # while the host runs wave k+1's per-hit loop (the drain at the
        # end then mostly finds finished work)
        items = list(prefilter.items())
        n_waves = min(4, max(1, len(items) // 4))
        per = -(-len(items) // n_waves)
        out = {}
        in_flight = []
        for w0 in range(0, len(items), per):
            wave_out = dict(map_queries(one, items[w0:w0 + per]))
            out.update(wave_out)
            in_flight.append(_device_gates_dispatch(
                qdb, tdb, wave_out, params, qkey_to_idx, tkey_to_idx,
                need_tm, need_lddt))
        _rec("host_loop", _time.perf_counter() - _t0)
        logger.debug("align: host per-hit loop + wave dispatch %.2fs",
                     _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()
        for fleets in in_flight:
            _device_gates_finish(fleets, params, need_tm, need_lddt)
        _rec("gates_drain", _time.perf_counter() - _t0)
        logger.debug("align: device TM/LDDT gates drain %.2fs",
                     _time.perf_counter() - _t0)
        key = (compare_hits_by_structure_bits
               if params.sort_by_structure_bits else compare_hits)
        for rs in out.values():
            rs.sort(key=key)
        return out
    out = dict(map_queries(one, prefilter.items()))
    _rec("host_loop", _time.perf_counter() - _t0)
    logger.debug("align: host per-hit loop %.2fs",
                 _time.perf_counter() - _t0)
    return out


def _device_gates(qdb, tdb, results, params, qkey_to_idx, tkey_to_idx,
                  need_tm, need_lddt):
    fleets = _device_gates_dispatch(qdb, tdb, results, params, qkey_to_idx,
                                    tkey_to_idx, need_tm, need_lddt)
    _device_gates_finish(fleets, params, need_tm, need_lddt)


def _device_gates_dispatch(qdb, tdb, results, params, qkey_to_idx,
                           tkey_to_idx, need_tm, need_lddt):
    """Phase B dispatch: fused batched TM+LDDT (ops/gates_device) over
    every survivor with device-side coordinate gather from an HBM-resident
    target C-alpha panel. One async launch per m_pad bucket — returns the
    in-flight fleets so the caller can overlap further host work (the next
    query wave's backtraces) with the device compute before draining via
    _device_gates_finish. Tiny alignments (<8 columns) take the host path
    inline — degenerate superpositions are where f32 and the reference's
    f64 could drift."""
    import jax
    import jax.numpy as jnp

    from ..ops.gates_device import GateFleet, resident_ca_panel

    lddt_ctx_cache: Dict[int, tuple] = {}
    buckets: Dict[int, list] = {}  # m_pad -> [(res, qkey, ti, norm, m)]
    for qkey, rs in results.items():
        qi = qkey_to_idx[int(qkey)]
        q_ca = qdb.get_ca(qi)
        q_len = qdb.entry_len(qi)
        if need_lddt and int(qkey) not in lddt_ctx_cache:
            lddt_ctx_cache[int(qkey)] = lddt_ops.lddt_query_context(q_ca)
        ctx = lddt_ctx_cache.get(int(qkey))
        for res in rs:
            ti = tkey_to_idx[res.db_key]
            m = res.backtrace.count("M")
            if m < 8:
                _host_gates_one(res, q_ca, tdb.get_ca(ti), ctx, params,
                                q_len, tdb.entry_len(ti), need_tm, need_lddt)
                continue
            norm = tm_ops.normalization(
                params.tmscore_threshold_mode,
                min(res.q_end - res.q_start, res.t_end - res.t_start),
                q_len, res.t_len)
            m_pad = 64
            while m_pad < m:
                m_pad *= 4  # small family {64, 256, 1024, ...}: few compiles
            buckets.setdefault(m_pad, []).append(
                (res, int(qkey), ti, norm, m))
    if not buckets:
        return []

    # query coords + per-residue LDDT degree, concatenated per fleet (tiny)
    q_row: Dict[int, int] = {}
    qc_list, qd_list = [], []
    rows = 0
    for qkey in results:
        qi = qkey_to_idx[int(qkey)]
        q_row[int(qkey)] = rows
        qc = np.asarray(qdb.get_ca(qi), dtype=np.float32)
        qc_list.append(qc)
        if need_lddt and int(qkey) in lddt_ctx_cache:
            qd_list.append(lddt_ctx_cache[int(qkey)][1])
        else:
            qd_list.append(np.zeros(len(qc), np.float32))
        rows += len(qc)
    q_coords = np.concatenate(qc_list) if qc_list else np.zeros((1, 3), np.float32)
    q_deg = (np.concatenate(qd_list).astype(np.float32)
             if qd_list else np.zeros(1, np.float32))

    # target panel: whole-DB resident (preferred; reused across searches)
    # or a per-fleet union upload when the DB exceeds the HBM budget
    t_panel = resident_ca_panel(tdb)
    if t_panel is not None:
        t_base = np.asarray(tdb.offsets[:-1], dtype=np.int64)
    else:
        needed = sorted({ti for items in buckets.values()
                         for (_, _, ti, _, _) in items})
        t_base = np.zeros(tdb.size, dtype=np.int64)
        tc_list = []
        rows = 0
        for ti in needed:
            t_base[ti] = rows
            tc = np.asarray(tdb.get_ca(ti), dtype=np.float32)
            tc_list.append(tc)
            rows += len(tc)
        t_panel = jnp.asarray(np.concatenate(tc_list))
    q_coords_d, q_deg_d = jax.device_put((q_coords, q_deg))

    # fill + dispatch every bucket before draining any (async dispatch:
    # the device computes bucket k while the host fills bucket k+1).
    # Gather indices for the whole bucket come from ONE vectorized pass
    # over the concatenated backtrace strings (16k per-hit python calls
    # were ~0.8 s of the stage).
    fleets = []
    for m_pad, items in sorted(buckets.items()):
        fleet = GateFleet(m_pad, len(items), need_tm, need_lddt)
        P = len(items)
        joined = "".join(it[0].backtrace for it in items).encode("ascii")
        arr = np.frombuffer(joined, dtype=np.uint8)
        lens = np.fromiter((len(it[0].backtrace) for it in items),
                           dtype=np.int64, count=P)
        off = np.zeros(P + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        seg = np.repeat(np.arange(P, dtype=np.int64), lens)
        qstep = arr != ord("D")
        tstep = arr != ord("I")
        mmask = arr == ord("M")
        # per-segment exclusive cumsums via global-cumsum rebasing
        cq = np.cumsum(qstep)
        ct = np.cumsum(tstep)
        cm = np.cumsum(mmask)
        base = off[:-1]
        lq_excl = (cq - qstep) - (cq[base] - qstep[base])[seg]
        lt_excl = (ct - tstep) - (ct[base] - tstep[base])[seg]
        lm_excl = (cm - mmask) - (cm[base] - mmask[base])[seg]
        q_starts = np.fromiter((it[0].q_start for it in items),
                               dtype=np.int64, count=P)
        t_starts = np.fromiter((it[0].t_start for it in items),
                               dtype=np.int64, count=P)
        q_rows = np.fromiter((q_row[it[1]] for it in items),
                             dtype=np.int64, count=P)
        t_bases = np.fromiter((t_base[it[2]] for it in items),
                              dtype=np.int64, count=P)
        rows = seg[mmask]
        cols = lm_excl[mmask]
        fleet.qabs[rows, cols] = (q_rows[rows] + q_starts[rows]
                                  + lq_excl[mmask])
        fleet.tabs[rows, cols] = (t_bases[rows] + t_starts[rows]
                                  + lt_excl[mmask])
        fleet.m_len[:P] = np.fromiter((it[4] for it in items),
                                      dtype=np.int32, count=P)
        fleet.norm[:P] = np.fromiter((it[3] for it in items),
                                     dtype=np.int32, count=P)
        fleet.dispatch(t_panel, q_coords_d, q_deg_d)
        fleets.append((items, fleet))
    return fleets


def _device_gates_finish(fleets, params, need_tm, need_lddt):
    """Phase B drain: block on each in-flight fleet's packed readback and
    apply TM/LDDT + the structure-bit score scaling."""
    for items, fleet in fleets:
        tm, lddt, _ = fleet.result()
        for j, (res, *_rest) in enumerate(items):
            if need_tm:
                res.tm = float(tm[j])
            if need_lddt:
                res.lddt = float(lddt[j])
            if params.sort_by_structure_bits and need_tm and need_lddt:
                # degenerate superpositions (toy/colinear coords) can yield
                # NaN TM; finite-positive guard keeps parity elsewhere
                f = res.lddt * res.tm
                res.score = int(res.score * math.sqrt(f)) if f > 0 else 0


def _host_gates_one(res, q_ca, t_ca, lddt_ctx, params, q_len, t_len,
                    need_tm, need_lddt):
    """Host-native TM/LDDT for one survivor (the phase-B fallback)."""
    if not res.backtrace:  # block-align failure row: TM/LDDT fixed at 0
        return
    if need_tm:
        norm_len = tm_ops.normalization(
            params.tmscore_threshold_mode,
            min(res.q_end - res.q_start, res.t_end - res.t_start),
            q_len, t_len)
        tmres = tm_ops.compute_tm_score(q_ca, t_ca, res.q_start, res.t_start,
                                        res.backtrace, norm_len)
        res.tm = tmres.tmscore
        res.u = tmres.u
        res.t = tmres.t
    if need_lddt:
        lr = lddt_ops.compute_lddt(q_ca, t_ca, res.q_start, res.t_start,
                                   res.backtrace, q_ctx=lddt_ctx)
        res.lddt = lr.avg_lddt
    if params.sort_by_structure_bits and need_tm and need_lddt:
        f = res.lddt * res.tm
        res.score = int(res.score * math.sqrt(f)) if f > 0 else 0


def _pre_gate_mask(params, q_len, t_lens, qend, tend, ev_fwd, ev_corr):
    """Vectorized pre-backtrace gates — element-identical to the scalar
    loop's first four checks (canBeCovered, endpoint coverage estimate,
    forward + corrected E-value)."""
    ok = can_be_covered_mask(params.cov_thr, params.cov_mode, q_len, t_lens)
    if params.cov_thr > 0.0:
        q_cov0 = np.minimum(1.0, (qend + 1) / q_len)
        t_cov0 = np.minimum(1.0, (tend + 1) / t_lens)
        if params.cov_mode == 0:
            ok &= (q_cov0 >= params.cov_thr) & (t_cov0 >= params.cov_thr)
        elif params.cov_mode == 1:
            ok &= t_cov0 >= params.cov_thr
        elif params.cov_mode == 2:
            ok &= q_cov0 >= params.cov_thr
    ok &= (ev_fwd <= params.evalue_thr) & (ev_corr <= params.evalue_thr)
    return ok


# sentinel: the block-aligner search could not reproduce the forward score
# for this hit — the reference emits its failure row instead of falling
# back (structurealign.cpp:78-89; the `align.score1 == UINT32_MAX` check
# reads the pre-call struct and is dead code in the default build)
BLOCK_FAIL = object()


def use_block_aligner(prof) -> bool:
    """True when the backtrace stage should run the reference's DEFAULT
    block-aligner path (alignStartPosBacktraceBlock): plain sequence query
    (profile searches take the alignStartPosBacktrace reverse-SW path,
    structurealign.cpp:77+92), native lib present, not disabled via
    FOLDSEEK_TPU_BLOCK_ALIGNER=0 (the pre-r5 reverse-SW + banded path —
    byte-parity vs the block-aligner-stubbed reference build)."""
    import os
    if os.environ.get("FOLDSEEK_TPU_BLOCK_ALIGNER", "1") == "0":
        return False
    from ..ops.sw import QueryProfile
    if type(prof) is not QueryProfile:  # PSSMQueryProfile = profile search
        return False
    from .. import native
    lib = native.get_lib()
    return lib is not None and hasattr(lib, "batch_recover_block")


def _block_mats(prof):
    """(mat_aa, mat_ss) int8 21x21 exactly as the block path receives them
    (subMatAA/subMat3Di->subMatrix, StructureSmithWaterman.cpp:428-446);
    3Di-only mode zeroes the AA matrix (structurealign.cpp:264-265)."""
    from ..ops.matrices import blosum62, mat3di
    maa = blosum62().scores.astype(np.int8)
    if not getattr(prof, "_with_aa", True):
        maa = np.zeros_like(maa)
    return maa, mat3di().scores.astype(np.int8)


def _block_tracebacks(prof, db_aa, db_ss, t_offs, t_ends, scores, q_ends):
    """Run batch_recover_block over hit arrays; list of Traceback /
    BLOCK_FAIL / None (native unavailable)."""
    from .. import native
    fprof = getattr(prof, "_flipped_cache", None)
    if fprof is None:
        fprof = prof.flipped()
        prof._flipped_cache = fprof
    bias_rev = (fprof.bias_aa.astype(np.int16)
                + fprof.bias_ss.astype(np.int16))
    maa, mss = _block_mats(prof)
    res = native.batch_recover_block(
        fprof.q_aa, fprof.q_ss, bias_rev, maa, mss, db_aa, db_ss,
        t_offs, t_ends, scores, q_ends, prof.gap_open, prof.gap_extend)
    if res is None:
        return None
    q_start, t_start, ident, ops = res
    out = []
    for j in range(len(ops)):
        if ops[j] == "BLOCK_FAIL":
            out.append(BLOCK_FAIL)
        else:
            out.append(bt_ops.Traceback(
                q_start=int(q_start[j]), t_start=int(t_start[j]),
                backtrace=ops[j], identical_aa=int(ident[j])))
    return out


def _block_traceback_one(prof, t_aa, t_ss, score, q_end, t_end):
    """Single-pair block backtrace (alt-alignment / non-default-budget
    paths); Traceback, BLOCK_FAIL, or None when native is unavailable."""
    t_aa = np.ascontiguousarray(t_aa, dtype=np.int8)
    t_ss = np.ascontiguousarray(t_ss, dtype=np.int8)
    res = _block_tracebacks(
        prof, t_aa, t_ss,
        np.zeros(1, np.int64), np.asarray([t_end], np.int32),
        np.asarray([score], np.int32), np.asarray([q_end], np.int32))
    return None if res is None else res[0]


def _batch_tracebacks(prof, tdb, tids, cand_keys, params, q_len,
                      fwd, qend, tend, pre_ok):
    """ci -> Traceback for every candidate the serial loop would backtrace,
    recovered in one native call (block-aligner by default; reverse-SW +
    banded with FOLDSEEK_TPU_BLOCK_ALIGNER=0). Empty when batching can't
    reproduce the loop exactly (non-default accept/reject budgets: an
    early break could skip candidates) or the native lib is absent."""
    from .params import INT_MAX
    if (params.max_accept < INT_MAX or params.max_rejected < INT_MAX
            or len(tids) == 0):
        return {}
    from .. import native
    if native.get_lib() is None or not isinstance(tdb, StructDB):
        return {}
    surv = np.nonzero(pre_ok)[0]
    if not len(surv):
        return {}
    offs = np.asarray(tdb.offsets)
    from ..utils.log import StageTimer
    if use_block_aligner(prof):
        with StageTimer("batch_recover"):
            res = _block_tracebacks(
                prof, np.asarray(tdb.aa), np.asarray(tdb.ss),
                offs[tids[surv]], tend[surv], fwd[surv], qend[surv])
        if res is None:
            return {}
        return {int(ci): res[j] for j, ci in enumerate(surv)}
    fprof = getattr(prof, "_flipped_cache", None)
    if fprof is None:
        fprof = prof.flipped()
        prof._flipped_cache = fprof
    with StageTimer("batch_recover"):
        res = native.batch_recover(
            fprof.prof_aa, fprof.prof_ss, prof.prof_aa, prof.prof_ss,
            np.asarray(prof.q_aa), np.asarray(tdb.aa), np.asarray(tdb.ss),
            offs[tids[surv]], tend[surv], fwd[surv], qend[surv],
            prof.gap_open, prof.gap_extend)
    if res is None:
        return {}
    q_start, t_start, ident, ops = res
    out = {}
    for j, ci in enumerate(surv):
        if ops[j] is not None:
            out[int(ci)] = bt_ops.Traceback(
                q_start=int(q_start[j]), t_start=int(t_start[j]),
                backtrace=ops[j], identical_aa=int(ident[j]))
    return out


def align_query(qi: int, qdb: StructDB, tdb: StructDB,
                cand_keys: Sequence[int], params: SearchParams,
                ev: EvalueComputer, scorer: PairScorer, tkey_to_idx,
                need_tm: bool, need_lddt: bool, same_db: bool,
                gates_mode: str = "inline") -> List[AlnResult]:
    q_aa = qdb.get_aa(qi)
    q_ss = qdb.get_ss(qi)
    q_len = len(q_aa)
    qkey = int(qdb.keys[qi])
    prof = scorer.profs[qkey]
    lam, mu = ev.predict_lambda_mu(q_ss)
    q_ca = qdb.get_ca(qi) if need_tm or need_lddt else None
    lddt_ctx = lddt_ops.lddt_query_context(q_ca) if need_lddt else None

    tids = np.array([tkey_to_idx[int(k)] for k in cand_keys], dtype=np.int64)
    if len(tids) == 0:
        return []

    fwd, qend, tend, rev = scorer.per_query[qkey]
    scores = fwd - rev
    ev_fwd = ev.evalue_corr_batch(fwd, lam, mu)
    ev_corr = ev.evalue_corr_batch(scores, lam, mu)

    offs = np.asarray(tdb.offsets)
    t_lens_arr = offs[tids + 1] - offs[tids]
    # vectorized pre-backtrace gates (canBeCovered + endpoint coverage +
    # both E-values) — element-identical to the scalar checks
    pre_ok = _pre_gate_mask(params, q_len, t_lens_arr, qend, tend,
                            ev_fwd, ev_corr)

    # batched native start+traceback recovery: with the default INT_MAX
    # accept/reject budgets no candidate is skipped by an early break, so
    # every candidate passing the pre-backtrace gates gets its traceback
    # from ONE native call (vs 2 ctypes round trips per hit)
    pre_tb = _batch_tracebacks(
        prof, tdb, tids, cand_keys, params, q_len, fwd, qend, tend, pre_ok)

    qkey_int = int(qdb.keys[qi])
    identity_ok = same_db or params.include_identity
    pre_ok_l = pre_ok.tolist()
    scores_l = scores.tolist()
    ev_corr_l = ev_corr.tolist()
    qend_l = qend.tolist()
    tend_l = tend.tolist()
    t_lens_l = t_lens_arr.tolist()
    results: List[AlnResult] = []
    passed = 0
    rejected = 0
    for ci in range(len(tids)):
        if passed >= params.max_accept or rejected >= params.max_rejected:
            break
        tkey = int(cand_keys[ci])
        t_len = t_lens_l[ci]
        # reference: isIdentity = (queryId == targetId && (includeIdentity || sameDB))
        is_identity = (qkey_int == tkey) and identity_ok
        if not pre_ok_l[ci]:
            rejected += 1
            continue
        ti = tids[ci]

        tb = pre_tb.get(ci)
        if tb is None and use_block_aligner(prof):
            tb = _block_traceback_one(
                prof, np.asarray(tdb.get_aa(ti)), np.asarray(tdb.get_ss(ti)),
                int(fwd[ci]), int(qend[ci]), int(tend[ci]))
        if tb is None:
            try:
                tb = bt_ops.recover_alignment(
                    prof, np.asarray(tdb.get_aa(ti)),
                    np.asarray(tdb.get_ss(ti)),
                    int(fwd[ci]), int(qend[ci]), int(tend[ci]))
            except RuntimeError as e:
                logger.warning("backtrace failed for query %d target %d: %s",
                               qi, ti, e)
                rejected += 1
                continue
        if tb is BLOCK_FAIL:
            # the reference's block-align failure row: score1 = UINT32_MAX
            # propagates the alignScoreEndPos struct unchanged (the dead
            # `align.score1 == UINT32_MAX` check never triggers a fallback),
            # so qStart/dbStart stay -1, the backtrace stays empty, covs
            # keep their start-0 estimates, seqId is 0 and alnLength =
            # computeAlnLength(-1, qEnd, -1, dbEnd)
            # (structurealign.cpp:78-108, Matcher.cpp:155-157)
            aln_len = max(qend_l[ci] + 1, tend_l[ci] + 1) + 1
            res = AlnResult(
                db_key=tkey, score=scores_l[ci], seq_id=0.0,
                evalue=ev_corr_l[ci],
                q_start=-1, q_end=qend_l[ci], q_len=q_len,
                t_start=-1, t_end=tend_l[ci], t_len=t_len,
                backtrace="", qcov=min(1.0, (qend_l[ci] + 1) / q_len),
                tcov=min(1.0, (tend_l[ci] + 1) / t_len),
                aln_length=aln_len, identical=0)
            ok = is_identity or (
                res.evalue <= params.evalue_thr
                and res.seq_id >= params.seq_id_thr
                and has_coverage(params.cov_thr, params.cov_mode, res.qcov,
                                 res.tcov)
                and aln_len >= params.aln_len_thr)
            if not ok:
                rejected += 1
                continue
            if need_tm or need_lddt:
                # no aligned pairs: TM/LDDT degenerate to 0 (the gates below
                # then drop the row when a positive threshold is active)
                res.tm = 0.0
                res.lddt = 0.0
                if params.tmscore_threshold > 0 or params.lddt_threshold > 0:
                    continue
                if params.sort_by_structure_bits and need_tm and need_lddt:
                    res.score = 0
            results.append(res)
            passed += 1
            rejected = 0
            continue

        aln_len = len(tb.backtrace)
        seq_id = tb.identical_aa / aln_len if aln_len else 0.0
        qcov = (qend_l[ci] - tb.q_start + 1) / q_len
        tcov = (tend_l[ci] - tb.t_start + 1) / t_len
        res = AlnResult(
            db_key=tkey, score=scores_l[ci], seq_id=float(np.float32(seq_id)),
            evalue=ev_corr_l[ci],
            q_start=int(tb.q_start), q_end=qend_l[ci], q_len=q_len,
            t_start=int(tb.t_start), t_end=tend_l[ci], t_len=t_len,
            backtrace=tb.backtrace, qcov=qcov, tcov=tcov,
            aln_length=aln_len, identical=tb.identical_aa)

        ok = is_identity or (
            res.evalue <= params.evalue_thr
            and res.seq_id >= params.seq_id_thr
            and has_coverage(params.cov_thr, params.cov_mode, qcov, tcov)
            and aln_len >= params.aln_len_thr)
        if not ok:
            rejected += 1
            continue

        if (need_tm or need_lddt) and gates_mode == "inline":
            t_ca = tdb.get_ca(ti)
            if need_tm:
                norm_len = tm_ops.normalization(
                    params.tmscore_threshold_mode,
                    min(res.q_end - res.q_start, res.t_end - res.t_start),
                    q_len, t_len)
                tmres = tm_ops.compute_tm_score(q_ca, t_ca, res.q_start, res.t_start,
                                                res.backtrace, norm_len)
                if tmres.tmscore < params.tmscore_threshold:
                    continue
                res.tm = tmres.tmscore
                res.u = tmres.u
                res.t = tmres.t
            if need_lddt:
                lr = lddt_ops.compute_lddt(q_ca, t_ca, res.q_start, res.t_start,
                                           res.backtrace, q_ctx=lddt_ctx)
                if lr.avg_lddt < params.lddt_threshold:
                    continue
                res.lddt = lr.avg_lddt
            if params.sort_by_structure_bits and need_tm and need_lddt:
                # degenerate superpositions (toy/colinear coords) can yield
                # NaN TM; finite-positive guard keeps parity elsewhere
                f = res.lddt * res.tm
                res.score = int(res.score * math.sqrt(f)) if f > 0 else 0

        results.append(res)
        passed += 1
        rejected = 0

        # alternative alignments: X-mask the aligned target region and
        # re-align (structurealign.cpp:115-138, computeAlternativeAlignment)
        if params.alt_alignment > 0:
            from ..ops.sw import sw_score_endpos_np
            t_aa = tdb.get_aa(ti)
            t_ss = tdb.get_ss(ti)
            t_aa_m = np.asarray(t_aa).copy()
            t_ss_m = np.asarray(t_ss).copy()
            prev = res
            rprof = scorer.rprofs[qkey]
            for _ in range(params.alt_alignment):
                t_aa_m[prev.t_start:prev.t_end] = 20
                t_ss_m[prev.t_start:prev.t_end] = 20
                a_fwd, a_qe, a_te = sw_score_endpos_np(
                    *prof.padded(prof.L), t_aa_m, t_ss_m,
                    gap_open=prof.gap_open, gap_extend=prof.gap_extend)
                a_rev, _, _ = sw_score_endpos_np(
                    *rprof.padded(prof.L), t_aa_m, t_ss_m,
                    gap_open=prof.gap_open, gap_extend=prof.gap_extend)
                a_score = int(a_fwd) - int(a_rev)
                a_ev = ev.evalue_corr(a_score, lam, mu)
                if (ev.evalue_corr(a_fwd, lam, mu) > params.evalue_thr
                        or a_ev > params.evalue_thr):
                    break
                a_tb = (_block_traceback_one(prof, t_aa_m, t_ss_m,
                                             int(a_fwd), a_qe, a_te)
                        if use_block_aligner(prof) else None)
                if a_tb is BLOCK_FAIL:
                    break  # reference would emit a -1/-1 empty-backtrace
                    # alt row (computeAlternativeAlignment -> the same dead
                    # fallback check); its X-masking of [-1, dbEnd) is UB,
                    # so the alt chain stops here instead
                if a_tb is None:
                    try:
                        a_tb = bt_ops.recover_alignment(
                            prof, t_aa_m, t_ss_m, int(a_fwd), a_qe, a_te)
                    except RuntimeError:
                        break
                a_len = len(a_tb.backtrace)
                a_seqid = a_tb.identical_aa / a_len if a_len else 0.0
                a_qcov = (a_qe - a_tb.q_start + 1) / q_len
                a_tcov = (a_te - a_tb.t_start + 1) / t_len
                alt = AlnResult(
                    db_key=tkey, score=a_score,
                    seq_id=float(np.float32(a_seqid)), evalue=float(a_ev),
                    q_start=a_tb.q_start, q_end=a_qe, q_len=q_len,
                    t_start=a_tb.t_start, t_end=a_te, t_len=t_len,
                    backtrace=a_tb.backtrace, qcov=a_qcov, tcov=a_tcov,
                    aln_length=a_len, identical=a_tb.identical_aa)
                ok_alt = (alt.evalue <= params.evalue_thr
                          and alt.seq_id >= params.seq_id_thr
                          and alt.aln_length >= params.aln_len_thr
                          and has_coverage(params.cov_thr, params.cov_mode,
                                           a_qcov, a_tcov))
                if not ok_alt:
                    break
                results.append(alt)
                prev = alt

    if gates_mode == "device":
        return results  # caller sorts after the batched TM/LDDT scaling
    if gates_mode == "host":
        _host_gates_batch(results, tdb, tkey_to_idx, params, q_len, q_ca,
                          lddt_ctx, need_tm, need_lddt)
    if params.sort_by_structure_bits:
        results.sort(key=compare_hits_by_structure_bits)
    else:
        results.sort(key=compare_hits)
    return results


def _host_gates_batch(results, tdb, tkey_to_idx, params, q_len, q_ca,
                      lddt_ctx, need_tm, need_lddt):
    """TM/LDDT for one query's accepted hits in ONE native call
    (native batch_gates — the same C routines as the per-hit path, so the
    scores are bit-identical; only the per-hit python marshalling goes)."""
    results = [r for r in results if r.backtrace]  # skip block-failure rows
    if not results:
        return
    from .. import native as native_mod
    t_cas, qs, ts, bts, nls = [], [], [], [], []
    for res in results:
        ti = tkey_to_idx[res.db_key]
        t_cas.append(tdb.get_ca(ti))
        qs.append(res.q_start)
        ts.append(res.t_start)
        bts.append(res.backtrace)
        nls.append(tm_ops.normalization(
            params.tmscore_threshold_mode,
            min(res.q_end - res.q_start, res.t_end - res.t_start),
            q_len, res.t_len) if need_tm else 0)
    out = native_mod.batch_gates(
        q_ca, lddt_ctx[1] if lddt_ctx is not None else None,
        t_cas, qs, ts, bts, nls, need_tm, need_lddt)
    if out is None:  # library vanished mid-run: per-hit fallback
        for res in results:
            ti = tkey_to_idx[res.db_key]
            _host_gates_one(res, q_ca, tdb.get_ca(ti), lddt_ctx, params,
                            q_len, res.t_len, need_tm, need_lddt)
        return
    for j, res in enumerate(results):
        if need_tm:
            res.tm = float(out["tm"][j])
            res.u = out["u"][j]
            res.t = out["t"][j]
        if need_lddt:
            res.lddt = float(out["lddt"][j])
        if params.sort_by_structure_bits and need_tm and need_lddt:
            f = res.lddt * res.tm
            res.score = int(res.score * math.sqrt(f)) if f > 0 else 0
