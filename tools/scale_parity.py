#!/usr/bin/env python3
"""Hit-level parity at scale (VERDICT r4 task 2): both engines ingest the
SAME synthetic structure set and their m8 rows are diffed — content, not
just throughput.

Flow: synth N targets + 16 queries (bench.py's seeds 1/4) -> export every
entry as a CA-only PDB tar -> BOTH the reference binary and this package
run createdb (pulchra N/C rebuild + 3Di, bit-exact at small scale) ->
createindex -> search --threads 1 -> convertalis with backtrace columns ->
row-level diff: per-query top hit, full row-set equality, and divergence
classes. The default k-mer prefilter path is compared byte-level; the
device gapless path (prefilter-mode 1, our TPU production mode) is
compared as top-hit/row overlap (different candidate generation by
design, ungappedprefilter.cpp vs Prefiltering.cpp).

Usage: python tools/scale_parity.py [n_targets=100000] [ref_bin]
Prints one JSON line + a PARITY/DIVERGED verdict.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FMT = ("query,target,fident,alnlen,mismatch,gapopen,qstart,qend,tstart,"
       "tend,evalue,bits,cigar")


def run(cmd, env=None):
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, env=env)
    if r.returncode != 0:
        raise RuntimeError("%s failed: %s" % (cmd[:3],
                                              r.stderr.decode()[-800:]))
    return time.perf_counter() - t0


def load_m8(path):
    rows = {}
    order = {}
    with open(path) as f:
        for line in f:
            q = line.split("\t", 1)[0]
            rows.setdefault(q, set()).add(line.rstrip("\n"))
            order.setdefault(q, []).append(line.rstrip("\n"))
    return rows, order


def main():
    n_targets = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    ref = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ref/build/src/foldseek"
    from bench_reference_scale import export_tar

    from foldseek_tpu.db.synth import synth_db
    from foldseek_tpu.ingest.createdb import create_db

    example = "/root/reference/example"
    files = [os.path.join(example, f) for f in sorted(os.listdir(example))
             if "tim" not in f]
    out = {"n_targets": n_targets}
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        base = create_db(files, os.path.join(td, "base"))
        tdb0 = synth_db(base, n_targets, os.path.join(td, "t0"), seed=1)
        qdb0 = synth_db(base, 16, os.path.join(td, "q0"), seed=4)
        # full N/CA/C backbones so both engines ingest identical inputs —
        # this isolates ENGINE parity; the CA-only ingest band (pulchra
        # float differences, ~1% of synthetic entries with a flipped
        # near-tie 3Di partner) is measured separately by the db_3di_*
        # fields when run with SCALE_PARITY_CA_ONLY=1
        full = os.environ.get("SCALE_PARITY_CA_ONLY", "") != "1"
        export_tar(tdb0, os.path.join(td, "t.tar"), full_backbone=full)
        export_tar(qdb0, os.path.join(td, "q.tar"), full_backbone=full)

        # reference side
        env = dict(os.environ)
        run([ref, "createdb", os.path.join(td, "t.tar"),
             os.path.join(td, "rtdb"), "--threads", "1"], env)
        run([ref, "createdb", os.path.join(td, "q.tar"),
             os.path.join(td, "rqdb"), "--threads", "1"], env)
        run([ref, "createindex", os.path.join(td, "rtdb"),
             os.path.join(td, "ritmp"), "--threads", "1"], env)
        dt = run([ref, "search", os.path.join(td, "rqdb"),
                  os.path.join(td, "rtdb"), os.path.join(td, "raln"),
                  os.path.join(td, "rstmp"), "-a", "--threads", "1"], env)
        out["ref_search_seconds"] = round(dt, 2)
        run([ref, "convertalis", os.path.join(td, "rqdb"),
             os.path.join(td, "rtdb"), os.path.join(td, "raln"),
             os.path.join(td, "ref.m8"), "--format-output", FMT,
             "--threads", "1"], env)

        # our side, ingesting the SAME tars
        from foldseek_tpu.cli import main as cli
        assert cli(["createdb", os.path.join(td, "t.tar"),
                    os.path.join(td, "otdb"), "-v", "1"]) == 0
        assert cli(["createdb", os.path.join(td, "q.tar"),
                    os.path.join(td, "oqdb"), "-v", "1"]) == 0
        for mode, tag in ((0, "kmer"), (1, "gapless")):
            t0 = time.perf_counter()
            assert cli(["search", os.path.join(td, "oqdb"),
                        os.path.join(td, "otdb"), os.path.join(td, f"oaln{mode}"),
                        os.path.join(td, f"otmp{mode}"),
                        "--prefilter-mode", str(mode), "-a", "-v", "1"]) == 0
            out[f"our_search_{tag}_seconds"] = round(time.perf_counter() - t0, 2)
            assert cli(["convertalis", os.path.join(td, "oqdb"),
                        os.path.join(td, "otdb"), os.path.join(td, f"oaln{mode}"),
                        os.path.join(td, f"our{mode}.m8"),
                        "--format-output", FMT, "-v", "1"]) == 0

        # DB-content check: both sides re-derived AA/3Di from the same
        # CA-only tar; any residual m8 band must trace to ingest divergence
        def read_flatdb(prefix):
            entries = {}
            with open(prefix + ".index") as f:
                idx = [line.split("\t") for line in f]
            data = open(prefix, "rb").read()
            for key, off, ln in idx:
                off, ln = int(off), int(ln)
                entries[int(key)] = data[off:off + ln].rstrip(b"\n\x00")
            return entries
        from foldseek_tpu.db.storage import load_db
        from foldseek_tpu.ops.matrices import decode_seq
        rss = read_flatdb(os.path.join(td, "rtdb_ss"))
        rhdr = read_flatdb(os.path.join(td, "rtdb_h"))
        name_to_ss = {rhdr[k].split()[0].decode(): rss[k].decode()
                      for k in rss}
        odb = load_db(os.path.join(td, "otdb"))
        n_entry_diff = n_char_diff = n_chars = 0
        first_diff = None
        for e in range(odb.size):
            nm = odb.names[e]
            ours = decode_seq(odb.get_ss(e))
            theirs = name_to_ss.get(nm)
            if theirs is None:
                continue
            n_chars += len(ours)
            if ours != theirs:
                n_entry_diff += 1
                d = sum(a != b for a, b in zip(ours, theirs))
                n_char_diff += d + abs(len(ours) - len(theirs))
                if first_diff is None:
                    first_diff = (nm, d, len(ours))
        out["db_3di_entry_diffs"] = n_entry_diff
        out["db_3di_char_diff_rate"] = round(n_char_diff / max(n_chars, 1), 6)
        if first_diff:
            out["db_3di_first_diff"] = list(first_diff)

        ref_rows, ref_order = load_m8(os.path.join(td, "ref.m8"))
        for mode, tag in ((0, "kmer"), (1, "gapless")):
            our_rows, our_order = load_m8(os.path.join(td, f"our{mode}.m8"))
            queries = sorted(set(ref_rows) | set(our_rows))
            top_eq = row_eq = 0
            inter = union = 0
            n_ref = sum(len(v) for v in ref_rows.values())
            n_our = sum(len(v) for v in our_rows.values())
            diverged = []
            for q in queries:
                r = ref_rows.get(q, set())
                o = our_rows.get(q, set())
                inter += len(r & o)
                union += len(r | o)
                ro = ref_order.get(q, [])
                oo = our_order.get(q, [])
                if ro and oo and ro[0] == oo[0]:
                    top_eq += 1
                elif ro and oo:
                    diverged.append((q, ro[0], oo[0]))
                row_eq += r == o
            out[f"{tag}_queries"] = len(queries)
            out[f"{tag}_ref_rows"] = n_ref
            out[f"{tag}_our_rows"] = n_our
            out[f"{tag}_top_hit_equal"] = top_eq
            out[f"{tag}_query_rowsets_equal"] = row_eq
            out[f"{tag}_row_jaccard"] = round(inter / max(union, 1), 4)
            if tag == "kmer":
                for q, a, b in diverged[:3]:
                    print(f"top-hit diff {q}:\n  ref {a}\n  our {b}",
                          file=sys.stderr)
                shown = 0
                for q in queries:
                    r = ref_rows.get(q, set())
                    o = our_rows.get(q, set())
                    ro_only = sorted(r - o)
                    oo_only = sorted(o - r)
                    for a in ro_only[:2]:
                        # pair with the same-target row on our side if any
                        t = a.split("\t")[1]
                        match = [x for x in oo_only
                                 if x.split("\t")[1] == t]
                        print("row diff  ref:", a, file=sys.stderr)
                        if match:
                            print("          our:", match[0], file=sys.stderr)
                        shown += 1
                        if shown >= 8:
                            break
                    if shown >= 8:
                        break
    kmer_parity = (out["kmer_query_rowsets_equal"] == out["kmer_queries"]
                   and out["kmer_ref_rows"] == out["kmer_our_rows"])
    out["kmer_byte_parity"] = kmer_parity
    print(json.dumps(out))
    print("RESULT:", "PARITY" if kmer_parity else "DIVERGED")
    return 0 if kmer_parity else 1


if __name__ == "__main__":
    sys.exit(main())
