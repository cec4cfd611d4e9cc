#!/usr/bin/env python3
"""Generate golden fixtures for the QueryMatcher hit-buffer flush semantics
(tests/test_chunked_flush.py) from a compiled oracle that drives the
reference's CacheFriendlyOperations verbatim. The oracle source lives in
tools/cfops_oracle/ (oracle.cpp + IndexTable.h/Util.h shims); the reference
.cpp is copied at build time and never committed here. Build:

    sh tools/cfops_oracle/build.sh /tmp/oracle

The fake diagonal scorer is (id * 2654435761 ^ diag16 * 40503) & 0xFF on
uint32 arithmetic — mirrored by the test. Each case runs under several
BINCOUNT template instantiations to pin that results are bin-independent
(the python implementation relies on per-id orderings only).

Usage: python tools/gen_cfops_golden.py /tmp/oracle/oracle
"""
import json
import os
import subprocess
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "tests", "golden", "cfops", "cases.json")


def gen_case(rng, scenario):
    max_pos = int(rng.integers(2, 12))
    db_size = int(rng.integers(4, 40))
    if scenario == "dense":
        # few ids/diags: heavy duplicate runs, scored-hit merges
        n_lists, max_len, max_db = 24, 8, int(rng.integers(12, 40))
        n_ids, n_js = 4, 6
    elif scenario == "wide":
        n_lists, max_len, max_db = 16, 10, int(rng.integers(20, 60))
        n_ids, n_js = db_size, 30
    elif scenario == "nochunk":
        n_lists, max_len, max_db = 10, 6, 100000
        n_ids, n_js = 8, 10
    elif scenario == "goto_outer":
        # one list at least as large as the whole buffer: zero hits
        n_lists, max_len, max_db = 8, 6, 12
        n_ids, n_js = 6, 8
    elif scenario == "tail_flush":  # big list near the end
        n_lists, max_len, max_db = 12, 8, 20
        n_ids, n_js = 5, 8
    else:  # zero_dup_flush: the FIRST flushed chunk holds no
        # double-diagonal hit, exercising the reference's
        # `overflowHitCount != 0` merge guard (QueryMatcher.cpp:322) —
        # the advisor-found init-vs-merge divergence (round-3 ADVICE)
        n_lists, max_len, max_db = 16, 6, 14
        db_size = max(db_size, 40)
        n_ids, n_js = 5, 6  # heavy collisions AFTER the first chunk
    lists = []
    pos = 0
    used = 0
    next_id = 0
    for li in range(n_lists):
        if rng.random() < 0.5 and pos < max_pos:
            pos = min(max_pos, pos + int(rng.integers(1, 3)))
        n = int(rng.integers(1, max_len + 1))
        if scenario == "goto_outer" and li == n_lists // 2:
            n = max_db + int(rng.integers(0, 4))
        if scenario == "zero_dup_flush" and used + n < max_db:
            # unique ids through the first chunk: no (id, diag) repeats,
            # so the first flush yields zero duplicates; later chunks
            # collide heavily so the next flush's init-vs-merge differs
            ids = [(next_id + i) % db_size for i in range(n)]
            next_id += n
        else:
            ids = rng.integers(0, n_ids, n).tolist()
        used += n
        js = rng.integers(0, n_js, n).tolist()
        lists.append((pos, ids, js))
    return {"db_size": db_size, "max_db": max_db, "max_pos": max_pos,
            "lists": lists}


def run_oracle(oracle, case, bincount):
    inp = ["%d %d %d %d" % (case["db_size"], case["max_db"], bincount,
                            case["max_pos"])]
    for pos, ids, js in case["lists"]:
        row = [str(pos), str(len(ids))]
        for i, j in zip(ids, js):
            row += [str(i), str(j)]
        inp.append(" ".join(row))
    r = subprocess.run([oracle], input="\n".join(inp) + "\n",
                       capture_output=True, text=True, check=True)
    rows = []
    for line in r.stdout.splitlines():
        i, d, c = line.split()
        rows.append([int(i), int(d), int(c)])
    return rows


def gen_zero_dup_cases(n_wanted=8, seed=7):
    """Fuzz-select cases that distinguish the reference's
    `overflowHitCount != 0` merge guard (QueryMatcher.cpp:322) from the
    buggy init-always-merge variant the round-3 advisor found: a flush
    whose chunk yields zero duplicate hits must leave the overflow block
    unstarted. Selection runs the repo implementation against an inline
    copy with the broken guard and keeps diverging cases (~1/1500)."""
    import inspect

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import foldseek_tpu.search.kmer as K
    src = inspect.getsource(K.chunked_candidates)
    buggy = src.replace("if ov is None or len(ov[0]) == 0:",
                        "if ov is None:")
    assert buggy != src
    ns = dict(K.__dict__)
    exec(compile(buggy, "cc_buggy.py", "exec"), ns)
    buggy_cc = ns["chunked_candidates"]

    def fake_score(ids, d16):
        ids = np.asarray(ids, dtype=np.uint32)
        d16 = np.asarray(d16, dtype=np.uint32)
        v = ids * np.uint32(2654435761) ^ (d16 * np.uint32(40503))
        return (v & np.uint32(0xFF)).astype(np.int64)

    def run_py(cc, case):
        lists = case["lists"]
        list_pos = np.array([p for p, _, _ in lists], dtype=np.int64)
        lens = np.array([len(ids) for _, ids, _ in lists], dtype=np.int64)
        list_off = np.zeros(len(lists) + 1, dtype=np.int64)
        np.cumsum(lens, out=list_off[1:])
        tids = np.concatenate([np.asarray(i, dtype=np.int64)
                               for _, i, _ in lists])
        jpos = np.concatenate([np.asarray(j, dtype=np.int64)
                               for _, _, j in lists])
        ids, cnt, d16 = cc(list_pos, list_off, tids, jpos, case["max_db"],
                           fake_score)
        return sorted(zip(ids.tolist(), d16.tolist(), cnt.tolist()))

    rng = np.random.default_rng(seed)
    found = []
    for _ in range(200000):
        max_db = int(rng.integers(6, 16))
        n_lists = int(rng.integers(6, 18))
        db_size = int(rng.integers(4, 30))
        n_ids = int(rng.integers(2, 8))
        n_js = int(rng.integers(2, 8))
        max_pos = int(rng.integers(2, 10))
        lists = []
        pos = used = nid = 0
        for _li in range(n_lists):
            if rng.random() < 0.5 and pos < max_pos:
                pos = min(max_pos, pos + int(rng.integers(1, 3)))
            n = int(rng.integers(1, 7))
            if used + n < max_db:
                ids = [(nid + i) % db_size for i in range(n)]
                nid += n
            else:
                ids = rng.integers(0, n_ids, n).tolist()
            used += n
            lists.append((pos, ids, rng.integers(0, n_js, n).tolist()))
        case = {"db_size": db_size, "max_db": max_db, "max_pos": max_pos,
                "lists": lists}
        if run_py(buggy_cc, case) != run_py(K.chunked_candidates, case):
            found.append(case)
            if len(found) >= n_wanted:
                break
    return found


def main():
    oracle = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle/oracle"
    rng = np.random.default_rng(20260818)
    cases = []
    gen = {"zero_dup_flush": iter(gen_zero_dup_cases())}
    for scenario in ("dense", "wide", "nochunk", "goto_outer", "tail_flush",
                     "zero_dup_flush"):
        for rep in range(8):
            if scenario in gen:
                case = next(gen[scenario])
            else:
                case = gen_case(rng, scenario)
            outs = [run_oracle(oracle, case, b) for b in (2, 4, 16)]
            # results must be independent of the bin count
            as_sets = [sorted(map(tuple, o)) for o in outs]
            assert as_sets[0] == as_sets[1] == as_sets[2], (
                "bin-dependent result in %s/%d" % (scenario, rep))
            case["scenario"] = scenario
            case["expected"] = sorted(map(list, as_sets[0]))
            cases.append(case)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(cases, f)
    print("wrote %d cases to %s" % (len(cases), OUT))


if __name__ == "__main__":
    main()
