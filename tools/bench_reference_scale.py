#!/usr/bin/env python3
"""Reference-binary yardstick at the BASELINE-config-5 scale (VERDICT r3
task 2): run the patched reference foldseek over the SAME synthetic 100k
target DB + 16-query set bench.py::bench_scale uses (seeds 1/4), single
thread, and report per-stage wall times.

The synthetic DB is exported as CA-only PDB records in a tar (the
reference rebuilds N/C with pulchra during createdb, exactly like its
own CA-only ingestion path); its 3Di then derives from the same jittered
coordinates, giving the same length mix and near-identical composition —
a throughput yardstick, not a parity harness (tools/fuzz_parity.py is
that). Reference flow mirrors a production search: createdb (timed,
excluded), createindex (timed), search --threads 1 (timed), convertalis
(timed).

Usage: python tools/bench_reference_scale.py [n_targets=100000] [ref_bin]
Writes one JSON line; paste the numbers into bench.py's
REFERENCE_SCALE_100K constants.
"""
import io
import json
import os
import subprocess
import sys
import tarfile
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

AA3 = ["ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS",
       "ILE", "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP",
       "TYR", "VAL", "UNK", "UNK"]


def export_tar(db, tar_path, full_backbone=False):
    """Write every entry as a PDB member of an uncompressed tar.

    CA-only by default (both sides then rebuild N/C with their pulchra
    implementations — float differences flip ~1% of entries' near-tie
    3Di partner selections, measured by tools/scale_parity.py, so this
    mode is a throughput yardstick). full_backbone=True writes N/CA/C
    (rebuilt once here, rounded to the PDB's 3 decimals) so BOTH engines
    ingest identical backbones and the comparison isolates the search
    engines."""
    aa = np.asarray(db.aa)
    ca = np.asarray(db.ca)
    offs = np.asarray(db.offsets)
    with tarfile.open(tar_path, "w") as tf:
        for e in range(db.size):
            s, t = offs[e], offs[e + 1]
            atoms = [("CA", ca[s:t], "C")]
            if full_backbone:
                from foldseek_tpu.ingest.backbone import rebuild_backbone
                n_xyz, c_xyz = rebuild_backbone(
                    np.asarray(ca[s:t], dtype=np.float64))
                atoms = [("N", n_xyz, "N"), ("CA", ca[s:t], "C"),
                         ("C", c_xyz, "C")]
            lines = []
            serial = 1
            for i in range(t - s):
                for aname, arr, elem in atoms:
                    x, y, z = arr[i]
                    if not np.isfinite(x):
                        continue
                    lines.append(
                        "ATOM  %5d  %-3s %3s A%4d    %8.3f%8.3f%8.3f  1.00  0.00           %s"
                        % (serial % 100000, aname, AA3[aa[s + i]],
                           (i + 1) % 10000, x, y, z, elem))
                    serial += 1
            data = ("\n".join(lines) + "\nEND\n").encode()
            ti = tarfile.TarInfo(name="e%06d.pdb" % e)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))


def run(cmd, env=None):
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, env=env)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError("%s failed: %s" % (cmd[:2], r.stderr.decode()[-500:]))
    return dt, r.stdout.decode() + r.stderr.decode()


def main():
    n_targets = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    ref = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ref/build/src/foldseek"
    from foldseek_tpu.db.synth import synth_db
    from foldseek_tpu.ingest.createdb import create_db

    example = "/root/reference/example"
    files = [os.path.join(example, f) for f in sorted(os.listdir(example))
             if "tim" not in f]
    out = {"n_targets": n_targets}
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        base = create_db(files, os.path.join(td, "base"))
        tdb = synth_db(base, n_targets, os.path.join(td, "t"), seed=1)
        qdb = synth_db(base, 16, os.path.join(td, "q"), seed=4)
        t0 = time.perf_counter()
        export_tar(tdb, os.path.join(td, "t.tar"))
        export_tar(qdb, os.path.join(td, "q.tar"))
        print("export: %.1fs" % (time.perf_counter() - t0), flush=True)

        env = dict(os.environ)
        dt, _ = run([ref, "createdb", os.path.join(td, "t.tar"),
                     os.path.join(td, "tdb"), "--threads", "1"], env)
        out["ref_createdb_seconds"] = round(dt, 2)
        print("createdb:", out["ref_createdb_seconds"], flush=True)
        dt, _ = run([ref, "createdb", os.path.join(td, "q.tar"),
                     os.path.join(td, "qdb"), "--threads", "1"], env)
        dt, _ = run([ref, "createindex", os.path.join(td, "tdb"),
                     os.path.join(td, "itmp"), "--threads", "1"], env)
        out["ref_createindex_seconds"] = round(dt, 2)
        print("createindex:", out["ref_createindex_seconds"], flush=True)
        dt, log = run([ref, "search", os.path.join(td, "qdb"),
                       os.path.join(td, "tdb"), os.path.join(td, "aln"),
                       os.path.join(td, "stmp"), "--threads", "1"], env)
        out["ref_search_seconds"] = round(dt, 2)
        print("search:", out["ref_search_seconds"], flush=True)
        dt, _ = run([ref, "convertalis", os.path.join(td, "qdb"),
                     os.path.join(td, "tdb"), os.path.join(td, "aln"),
                     os.path.join(td, "out.m8"), "--threads", "1"], env)
        out["ref_convertalis_seconds"] = round(dt, 2)
        with open(os.path.join(td, "out.m8")) as f:
            out["ref_hits"] = sum(1 for _ in f)
        out["ref_e2e_seconds"] = round(out["ref_search_seconds"]
                                       + out["ref_convertalis_seconds"], 2)
        out["ref_e2e_qps"] = round(16.0 / out["ref_e2e_seconds"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
