"""convertalis: alignment results -> BLAST-m8 style output.

Mirrors the reference formatter (reference:
src/strucclustutils/structureconvertalis.cpp:723-1010): per-row derived
columns (alnlen/mismatch/gapopen differ with vs without a stored backtrace),
custom column list (--format-output), float formats fident %.3f / evalue %.3E
(lib/mmseqs/src/commons/Util.cpp:667-684 SSTR).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..db.storage import StructDB
from ..ops import lddt as lddt_ops
from ..ops import tmscore as tm_ops
from .results import AlnResult, compress_backtrace, compute_aln_length, format_seq_id

DEFAULT_COLUMNS = ("query,target,fident,alnlen,mismatch,gapopen,"
                   "qstart,qend,tstart,tend,evalue,bits")

# columns that require the backtrace to be stored (reference:
# Parameters::getOutputFormat needBacktrace flags, Parameters.cpp:3021-3044,
# + the structure columns computed from the stored cigar in convertalis)
BACKTRACE_COLUMNS = {"qaln", "taln", "cigar", "ppos",
                     "alntmscore", "qtmscore", "ttmscore",
                     "lddt", "lddtfull", "rmsd", "u", "t"}
CA_COLUMNS = {"alntmscore", "qtmscore", "ttmscore", "lddt", "lddtfull", "rmsd",
              "u", "t", "qca", "tca", "prob"}


def needs_backtrace(fmt: str) -> bool:
    return bool(set(fmt.split(",")) & BACKTRACE_COLUMNS)


def _fmt_f(x) -> str:
    return f"{float(x):.3f}"


def _fmt_e(x) -> str:
    return f"{float(x):.3E}"


def format_results(qdb: StructDB, tdb: StructDB,
                   results: Dict[int, List[AlnResult]],
                   fmt: str = DEFAULT_COLUMNS,
                   with_backtrace: bool = False) -> List[str]:
    """Render m8 lines for all queries in query-key order."""
    cols = fmt.split(",")
    qkey_to_idx = qdb.key_to_index()
    tkey_to_idx = tdb.key_to_index()
    lines: List[str] = []
    for qkey in sorted(results):
        qi = qkey_to_idx[int(qkey)]
        qname = qdb.headers[qi].split()[0] if qdb.headers[qi] else qdb.names[qi]
        q_len = qdb.entry_len(qi)
        for r in results[qkey]:
            ti = tkey_to_idx[r.db_key]
            tname = tdb.headers[ti].split()[0] if tdb.headers[ti] else tdb.names[ti]
            lines.append(format_row(r, qname, tname, qdb, tdb, qi, ti, cols,
                                    with_backtrace))
    return lines


def format_row(r: AlnResult, qname: str, tname: str,
               qdb: StructDB, tdb: StructDB, qi: int, ti: int,
               cols: Sequence[str], with_backtrace: bool) -> str:
    # stored-record view: seq_id round-trips through the milli-truncated text
    # (resultToBuffer fastSeqIdToBuffer -> parseAlignmentRecord strtod); the
    # truncation multiply runs in float32
    if r.seq_id == 1.0:
        seq_id = 1.0
    else:
        seq_id = float(np.float32(int(np.float32(np.float32(r.seq_id) * 1000)) / 1000.0))
    if with_backtrace and r.backtrace:
        aln_len = len(r.backtrace)
        match_count = r.backtrace.count("M")
        gap_open_count = sum(
            1 for i, op in enumerate(r.backtrace)
            if op in "ID" and (i == 0 or r.backtrace[i - 1] != op))
        identical = int(np.float32(np.float32(seq_id) * np.float32(aln_len) + np.float32(0.5)))
        mismatch = match_count - identical
    else:
        aln_len = compute_aln_length(r.q_start, r.q_end, r.t_start, r.t_end)
        best_match_estimate = np.float32(min(abs(r.q_end - max(r.q_start, 0)),
                                             abs(r.t_end - max(r.t_start, 0))))
        mismatch = int(np.float32(best_match_estimate
                                  * (np.float32(1.0) - np.float32(seq_id)) + np.float32(0.5)))
        gap_open_count = 0

    qcov = (r.q_end - r.q_start + 1) / r.q_len
    tcov = (r.t_end - r.t_start + 1) / r.t_len

    tm_cache = {}

    def tm_with_norm(norm_len):
        if norm_len not in tm_cache:
            tm_cache[norm_len] = tm_ops.compute_tm_score(
                qdb.get_ca(qi), tdb.get_ca(ti), r.q_start, r.t_start,
                r.backtrace, norm_len)
        return tm_cache[norm_len]

    out = []
    for c in cols:
        if c == "query":
            out.append(qname)
        elif c == "target":
            out.append(tname)
        elif c == "fident":
            out.append(_fmt_f(seq_id))
        elif c == "pident":
            out.append(_fmt_f(seq_id * 100))
        elif c == "nident":
            out.append(str(int(seq_id * aln_len + 0.5)))
        elif c == "alnlen":
            out.append(str(aln_len))
        elif c == "mismatch":
            out.append(str(mismatch))
        elif c == "gapopen":
            out.append(str(gap_open_count))
        elif c == "qstart":
            out.append(str(r.q_start + 1))
        elif c == "qend":
            out.append(str(r.q_end + 1))
        elif c == "tstart":
            out.append(str(r.t_start + 1))
        elif c == "tend":
            out.append(str(r.t_end + 1))
        elif c == "qlen":
            out.append(str(r.q_len))
        elif c == "tlen":
            out.append(str(r.t_len))
        elif c == "evalue":
            out.append(_fmt_e(r.evalue))
        elif c == "bits":
            out.append(str(int(r.score)))
        elif c == "raw":
            out.append(str(int(r.score)))
        elif c == "qcov":
            out.append(_fmt_f(qcov))
        elif c == "tcov":
            out.append(_fmt_f(tcov))
        elif c == "cigar":
            out.append(compress_backtrace(r.backtrace))
        elif c == "qseq":
            out.append(qdb.get_aa_str(qi))
        elif c == "tseq":
            out.append(tdb.get_aa_str(ti))
        elif c == "q3di":
            out.append(qdb.get_ss_str(qi))
        elif c == "t3di":
            out.append(tdb.get_ss_str(ti))
        elif c == "qheader":
            out.append(qdb.headers[qi])
        elif c == "theader":
            out.append(tdb.headers[ti])
        elif c == "qaln":
            # query consumes M/I, shows '-' on D (structureconvertalis
            # structurePrintSeqBasedOnAln)
            out.append(_aligned_string(qdb.get_aa_str(qi), r.q_start, r.backtrace, "D"))
        elif c == "taln":
            out.append(_aligned_string(tdb.get_aa_str(ti), r.t_start, r.backtrace, "I"))
        elif c == "qtmscore":
            out.append(_fmt_e(tm_with_norm(r.q_len).tmscore))
        elif c == "ttmscore":
            out.append(_fmt_e(tm_with_norm(r.t_len).tmscore))
        elif c == "alntmscore":
            norm = min(r.q_end - r.q_start, r.t_end - r.t_start)
            out.append(_fmt_e(tm_with_norm(norm).tmscore))
        elif c == "rmsd":
            out.append(_fmt_e(tm_with_norm(r.t_len).rmsd))
        elif c == "lddt":
            lr = lddt_ops.compute_lddt(qdb.get_ca(qi), tdb.get_ca(ti),
                                       r.q_start, r.t_start, r.backtrace)
            out.append(_fmt_e(lr.avg_lddt))
        elif c == "lddtfull":
            lr = lddt_ops.compute_lddt(qdb.get_ca(qi), tdb.get_ca(ti),
                                       r.q_start, r.t_start, r.backtrace)
            out.append(",".join(_fmt_f(v) for v in lr.per_col))
        elif c == "u":
            u = tm_with_norm(r.t_len).u
            out.append(",".join(_fmt_e(u[i][j]) for i in range(3) for j in range(3)))
        elif c == "t":
            t = tm_with_norm(r.t_len).t
            out.append(",".join(_fmt_e(t[i]) for i in range(3)))
        elif c == "qca":
            out.append(_ca_to_str(qdb.get_ca(qi)))
        elif c == "tca":
            out.append(_ca_to_str(tdb.get_ca(ti)))
        elif c == "prob":
            out.append(_fmt_f(calc_prob_tp(int(r.score))))
        elif c == "empty":
            out.append("-")
        else:
            out.append("-")
    return "\t".join(out)


def _ca_to_str(ca) -> str:
    """caToStr (structureconvertalis.cpp:119-131): x,y,z per residue at %.3f,
    comma-separated, no trailing comma."""
    return ",".join(f"{float(v):.3f}" for row in np.asarray(ca) for v in row)


def _aligned_string(seq: str, start: int, backtrace: str, gap_op: str) -> str:
    """Gapped alignment string: gap_op is the op that does NOT consume this
    sequence ('I' for target view... reference structureconvertalis OUTFMT_QALN
    :924-955: query consumes M/I, gaps on D)."""
    out = []
    pos = start
    for op in backtrace:
        if op == "M":
            out.append(seq[pos])
            pos += 1
        elif op == gap_op:
            out.append("-")
        else:
            out.append(seq[pos])
            pos += 1
    return "".join(out)


def calc_prob_tp(score: float) -> float:
    """P(TP | structure bit score): fitted TP/FP gamma mixtures
    (reference: src/commons/CalcProbTP.h)."""
    import math
    s = np.float32(score)
    if s <= 10:
        return 0.0
    if s >= 100:
        return 1.0

    def gamma_pdf(alpha, beta, x):
        return np.float32(math.exp(alpha * math.log(beta) + (alpha - 1) * math.log(x)
                                   - beta * x - math.lgamma(alpha)))

    p_tp = (0.8279 * gamma_pdf(1.8123, 1 / 46.0042, s)
            + 0.1721 * gamma_pdf(1.0057, 1 / 563.5014, s)) * 0.1023
    p_fp = (0.34 * gamma_pdf(4.9259, 1 / 4.745, s)
            + 0.66 * gamma_pdf(9.4834, 1 / 1.3136, s)) * 0.8977
    return float(1.0 / (1.0 + (p_fp / p_tp)))
