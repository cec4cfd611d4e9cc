#!/usr/bin/env python3
"""Full-stack k-mer PSSM prefilter A/B vs the reference binary
(VERDICT r3 task 3a — re-measure the 97.7%/60% numbers after the
chunked-flush closure).

Flow: fuzz structures -> reference createdb + search -a + result2profile
-> the reference's OWN stored profile bytes (prof_ss records, 25 B/pos)
fed to BOTH sides:
  * reference: `prefilter prof_ss refdb_ss` (-s 9.5, k-mer profile mode)
  * ours: KmerPrefilter(profile_mode=True).query_pssm on our createdb of
    the same structures (3Di bit-exact), same stored bytes
and the (target, score, diagonal) rows are compared EXACTLY per query.

Usage: python tools/ab_pssm_prefilter.py [N=24] [SEED=5]
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_BIN = os.environ.get("FOLDSEEK_REF_BIN", "/tmp/ref/build/src/foldseek")


def run_ref(args):
    r = subprocess.run([REF_BIN] + args, capture_output=True)
    if r.returncode != 0:
        raise RuntimeError("ref %s failed: %s"
                           % (args[0], r.stderr.decode()[-400:]))


def read_dbr(path, binary=False):
    """Reference DBReader records: {key: bytes}. The index length counts
    ONE trailing \\0 terminator; binary records (profiles) may contain
    legitimate 0x00 data bytes, so exactly one byte is stripped (an
    rstrip would truncate zero-valued trailing positions)."""
    out = {}
    with open(path, "rb") as f:
        data = f.read()
    for line in open(path + ".index"):
        key, off, ln = line.split()
        rec = data[int(off): int(off) + int(ln)]
        out[int(key)] = rec[:-1] if binary else rec.rstrip(b"\x00")
    return out


def read_lookup(path):
    """key -> entry name."""
    out = {}
    for line in open(path):
        c = line.rstrip("\n").split("\t")
        out[int(c[0])] = c[1]
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from tools.fuzz_parity import make_fuzz_set

    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.kmer import KmerPrefilter
    from foldseek_tpu.search.params import SearchParams

    with tempfile.TemporaryDirectory() as td:
        pdb_dir = os.path.join(td, "pdbs")
        os.makedirs(pdb_dir)
        make_fuzz_set(pdb_dir, n, seed)

        rdb = os.path.join(td, "rdb")
        run_ref(["createdb", pdb_dir, rdb, "--threads", "1"])
        run_ref(["search", rdb, rdb, os.path.join(td, "aln"),
                 os.path.join(td, "stmp"), "--threads", "1", "-a"])
        prof = os.path.join(td, "prof")
        run_ref(["result2profile", rdb, rdb, os.path.join(td, "aln"),
                 prof, "--threads", "1"])
        run_ref(["prefilter", prof + "_ss", rdb + "_ss",
                 os.path.join(td, "rpref"), "-s", "9.5",
                 "--max-seqs", "1000", "--threads", "1"])

        profs = read_dbr(prof + "_ss", binary=True)
        rpref = read_dbr(os.path.join(td, "rpref"))
        ref_names = read_lookup(rdb + ".lookup")

        files = [os.path.join(pdb_dir, f)
                 for f in sorted(os.listdir(pdb_dir))]
        ourdb = create_db(files, os.path.join(td, "ourdb"))
        name_to_ouridx = {os.path.splitext(nm)[0]: i
                          for i, nm in enumerate(ourdb.names)}
        kp = KmerPrefilter(ourdb, SearchParams(sensitivity=9.5),
                           bias_scale=0.15, profile_mode=True)

        total_rows = exact_rows = 0
        q_exact = 0
        missing = extra = 0
        top_equal = 0
        nq = 0
        for qkey, rec in sorted(profs.items()):
            L = len(rec) // 25
            if L == 0:
                continue
            arr = np.frombuffer(rec[:L * 25], dtype=np.int8).reshape(L, 25)
            pssm = arr[:, :20].astype(np.int32)
            letters = arr[:, 20].astype(np.int64)
            hits = kp.query_pssm(pssm, letters, 1000)
            # our diagonals are uint16; the reference prints signed shorts
            ours = [(ourdb.names[t], int(s),
                     int(d) - 65536 if int(d) >= 32768 else int(d))
                    for t, s, d in hits]
            ref_rows = []
            for line in rpref.get(qkey, b"").decode().splitlines():
                c = line.split("\t")
                base = os.path.splitext(ref_names[int(c[0])])[0]
                ref_rows.append((base, int(c[1]), int(c[2])))
            ours_n = [(os.path.splitext(nm)[0], s, d) for nm, s, d in ours]
            nq += 1
            total_rows += len(ref_rows)
            rset = set(ref_rows)
            oset = set(ours_n)
            exact_rows += len(rset & oset)
            missing += len(rset - oset)
            extra += len(oset - rset)
            if ref_rows and ours_n and ref_rows[0] == ours_n[0]:
                top_equal += 1
            if ref_rows == ours_n:
                q_exact += 1
            elif missing and len(rset - oset) and nq <= 40:
                diffm = sorted(rset - oset)[:3]
                diffo = sorted(oset - rset)[:3]
                print(f"  q{qkey}: ref-only {diffm} ours-only {diffo}")
        print(f"pssm-prefilter A/B: {nq} profile queries, {total_rows} ref "
              f"rows; exact rows {exact_rows}/{total_rows} "
              f"({100.0*exact_rows/max(total_rows,1):.1f}%), queries fully "
              f"identical {q_exact}/{nq}, top-hit equal {top_equal}/{nq}, "
              f"missing {missing} extra {extra}")
        ok = exact_rows == total_rows and extra == 0
        print("RESULT:", "EXACT" if ok else "DIVERGED")
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
