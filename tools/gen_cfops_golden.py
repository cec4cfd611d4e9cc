#!/usr/bin/env python3
"""Generate golden fixtures for the QueryMatcher hit-buffer flush semantics
(tests/test_chunked_flush.py) from a compiled oracle that drives the
reference's CacheFriendlyOperations verbatim (see the oracle source
committed nowhere — it is a transient validation harness; build recipe:

    mkdir /tmp/oracle && cd /tmp/oracle
    cp $REF/lib/mmseqs/src/prefiltering/CacheFriendlyOperations.{h,cpp} .
    # shim IndexTable.h (IndexEntryLocal only) + Util.h (checkAllocation)
    # + oracle.cpp replicating QueryMatcher.cpp:250-365 with a fake scorer
    g++ -O2 -o oracle oracle.cpp

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
    else:  # tail_flush: big list near the end
        n_lists, max_len, max_db = 12, 8, 20
        n_ids, n_js = 5, 8
    lists = []
    pos = 0
    for li in range(n_lists):
        if rng.random() < 0.5 and pos < max_pos:
            pos = min(max_pos, pos + int(rng.integers(1, 3)))
        n = int(rng.integers(1, max_len + 1))
        if scenario == "goto_outer" and li == n_lists // 2:
            n = max_db + int(rng.integers(0, 4))
        ids = rng.integers(0, n_ids, n).tolist()
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


def main():
    oracle = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle/oracle"
    rng = np.random.default_rng(20260818)
    cases = []
    for scenario in ("dense", "wide", "nochunk", "goto_outer", "tail_flush"):
        for rep in range(8):
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
