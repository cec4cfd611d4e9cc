"""QueryMatcher hit-buffer flush semantics vs the reference's
CacheFriendlyOperations.

Golden fixtures (tests/golden/cfops/cases.json) were produced by an oracle
binary that compiles the reference's CacheFriendlyOperations.cpp verbatim
and drives it through the QueryMatcher::match() overflow flow
(QueryMatcher.cpp:250-365 + matchQuery align/keepMax, diagonalScoring=true)
with the fake diagonal scorer mirrored below; each case was generated under
BINCOUNT 2/4/16 and asserted bin-independent (tools/gen_cfops_golden.py).
"""
import json
import os

import numpy as np
import pytest

from foldseek_tpu.search.kmer import chunked_candidates

CASES = os.path.join(os.path.dirname(__file__), "golden", "cfops",
                     "cases.json")


def fake_score(ids, d16):
    ids = np.asarray(ids, dtype=np.uint32)
    d16 = np.asarray(d16, dtype=np.uint32)
    v = ids * np.uint32(2654435761) ^ (d16 * np.uint32(40503))
    return (v & np.uint32(0xFF)).astype(np.int64)


def _run_case(case):
    lists = case["lists"]
    list_pos = np.array([p for p, _, _ in lists], dtype=np.int64)
    lens = np.array([len(ids) for _, ids, _ in lists], dtype=np.int64)
    list_off = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=list_off[1:])
    tids = np.concatenate([np.asarray(ids, dtype=np.int64)
                           for _, ids, _ in lists])
    jpos = np.concatenate([np.asarray(js, dtype=np.int64)
                           for _, _, js in lists])
    ids, cnt, d16 = chunked_candidates(list_pos, list_off, tids, jpos,
                                       case["max_db"], fake_score)
    return sorted(zip(ids.tolist(), d16.tolist(), cnt.tolist()))


@pytest.mark.parametrize("scenario", ["dense", "wide", "nochunk",
                                      "goto_outer", "tail_flush",
                                      "zero_dup_flush"])
def test_chunked_flush_matches_reference(scenario):
    with open(CASES) as f:
        cases = json.load(f)
    ran = 0
    for case in cases:
        if case["scenario"] != scenario:
            continue
        got = _run_case(case)
        want = sorted(map(tuple, case["expected"]))
        assert got == want, "case %d of %s" % (ran, scenario)
        ran += 1
    assert ran == 8
