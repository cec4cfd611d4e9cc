#!/usr/bin/env python3
"""TM-engine A/B on IDENTICAL fixed alignments (multimer band tracing,
VERDICT r3 task 8): drive the reference's `aln2tmscore` (the same
TMaligner::computeTMscore the multimer assignment TM uses,
scoremultimer.cpp Assignment::getTmScore) with a synthetic alignment DB,
and compare against our compute_tm_score on the same coordinates.

Since r5 the engines are BIT-IDENTICAL (native/tm_ref.hpp, validated
300/300 bitwise against the reference's own TMaligner object code by
tools/native_tests/test_tm_ref.cpp); the residual ~5e-5 this tool reports
is purely aln2tmscore's 4-decimal text output being parsed back
(SSTR(double)), not an engine difference — verified by running both
engines on identical binary coords (/tmp/tmdual, bitwise equal).

Usage: python tools/ab_aln2tmscore.py [N_PAIRS=60] [SEED=1]
"""
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.fuzz_parity import REF_BIN, make_fuzz_set


def write_dbr(path, records, dbtype):
    """Minimal reference-format DB: records {key: bytes}."""
    with open(path, "wb") as f, open(path + ".index", "w") as idx:
        off = 0
        for key in sorted(records):
            data = records[key] + b"\x00"
            f.write(data)
            idx.write(f"{key}\t{off}\t{len(data)}\n")
            off += len(data)
    with open(path + ".dbtype", "wb") as f:
        f.write(struct.pack("<i", dbtype))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.ops import tmscore as tm_ops

    rng = np.random.default_rng(seed)
    with tempfile.TemporaryDirectory() as td:
        pdb_dir = os.path.join(td, "pdbs")
        os.makedirs(pdb_dir)
        make_fuzz_set(pdb_dir, max(8, n // 6), seed)
        rdb = os.path.join(td, "rdb")
        r = subprocess.run([REF_BIN, "createdb", pdb_dir, rdb,
                            "--threads", "1"], capture_output=True)
        assert r.returncode == 0, r.stderr.decode()[-300:]
        files = [os.path.join(pdb_dir, f)
                 for f in sorted(os.listdir(pdb_dir))]
        ourdb = create_db(files, os.path.join(td, "ourdb"))
        # reference keys by name
        ref_key = {}
        for line in open(rdb + ".lookup"):
            c = line.split("\t")
            ref_key[os.path.splitext(c[1])[0]] = int(c[0])
        our_of_ref = {}
        for i, nm in enumerate(ourdb.names):
            our_of_ref[ref_key[os.path.splitext(nm)[0]]] = i

        lens = {k: ourdb.entry_len(our_of_ref[k]) for k in ref_key.values()}
        keys = sorted(lens)
        # synthetic fixed alignments: random pairs, crop-matched windows,
        # pure-match backtraces of random span
        alns = {}
        cases = []
        for _ in range(n):
            qk, tk = rng.choice(keys, 2, replace=False)
            m = int(min(lens[qk], lens[tk]))
            span = int(rng.integers(min(24, m), m + 1))
            qs = int(rng.integers(0, lens[qk] - span + 1))
            ts = int(rng.integers(0, lens[tk] - span + 1))
            line = ("%d\t100\t1.000\t1.000E-05\t%d\t%d\t%d\t%d\t%d\t%d\t%s\n"
                    % (tk, qs, qs + span - 1, lens[qk],
                       ts, ts + span - 1, lens[tk], "M" * span))
            alns.setdefault(qk, []).append(line)
            cases.append((qk, tk, qs, ts, span))
        write_dbr(os.path.join(td, "aln"),
                  {k: "".join(v).encode() for k, v in alns.items()}, 5)

        r = subprocess.run([REF_BIN, "aln2tmscore", rdb, rdb,
                            os.path.join(td, "aln"),
                            os.path.join(td, "tmout"), "--threads", "1"],
                           capture_output=True)
        assert r.returncode == 0, r.stderr.decode()[-400:]

        # parse reference output: per query record lines "tkey TM t0 t1 t2 u..."
        ref_tm = {}
        data = open(os.path.join(td, "tmout"), "rb").read()
        for line in open(os.path.join(td, "tmout.index")):
            key, off, ln = line.split()
            rec = data[int(off): int(off) + int(ln)].rstrip(b"\x00").decode()
            rows = []
            for l in rec.splitlines():
                c = l.split()
                rows.append((int(c[0]), float(c[1])))
            ref_tm[int(key)] = rows

        # ours on identical inputs
        worst = 0.0
        n_done = 0
        ref_iter = {k: iter(v) for k, v in ref_tm.items()}
        for qk, tk, qs, ts, span in cases:
            rtk, rtm = next(ref_iter[qk])
            assert rtk == tk
            qi, ti = our_of_ref[qk], our_of_ref[tk]
            # aln2tmscore normalization (aln2tmscore.cpp:106)
            norm = tm_ops.normalization(0, span - 1, lens[qk], lens[tk])
            res = tm_ops.compute_tm_score(
                np.asarray(ourdb.get_ca(qi)), np.asarray(ourdb.get_ca(ti)),
                qs, ts, "M" * span, norm)
            worst = max(worst, abs(res.tmscore - rtm))
            n_done += 1
        print(f"aln2tmscore A/B: {n_done} fixed alignments, worst "
              f"|dTM| {worst:.2e}")
        print("RESULT:", "ENGINE-MATCH" if worst < 1e-4 else "ENGINE-DIVERGED")


if __name__ == "__main__":
    main()
