#!/usr/bin/env python3
"""Build a persistent scale-parity workspace (synth DB + tar export +
both engines' createdb) so individual stages can be re-run and timed.
Usage: python tools/sp_setup.py <dir> <n_targets> [ref_bin]"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_reference_scale import export_tar  # noqa: E402

from foldseek_tpu.db.synth import synth_db  # noqa: E402
from foldseek_tpu.ingest.createdb import create_db  # noqa: E402


def main():
    td = sys.argv[1]
    n_targets = int(sys.argv[2])
    ref = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ref/build/src/foldseek"
    os.makedirs(td, exist_ok=True)
    example = "/root/reference/example"
    files = [os.path.join(example, f) for f in sorted(os.listdir(example))
             if "tim" not in f]
    base = create_db(files, os.path.join(td, "base"))
    tdb0 = synth_db(base, n_targets, os.path.join(td, "t0"), seed=1)
    qdb0 = synth_db(base, 16, os.path.join(td, "q0"), seed=4)
    export_tar(tdb0, os.path.join(td, "t.tar"), full_backbone=True)
    export_tar(qdb0, os.path.join(td, "q.tar"), full_backbone=True)

    def run(cmd):
        t0 = time.perf_counter()
        r = subprocess.run(cmd, capture_output=True)
        assert r.returncode == 0, r.stderr.decode()[-500:]
        print(" ".join(cmd[:2]), round(time.perf_counter() - t0, 1), "s",
              flush=True)

    run([ref, "createdb", os.path.join(td, "t.tar"), os.path.join(td, "rtdb"),
         "--threads", "1"])
    run([ref, "createdb", os.path.join(td, "q.tar"), os.path.join(td, "rqdb"),
         "--threads", "1"])
    run([ref, "createindex", os.path.join(td, "rtdb"),
         os.path.join(td, "ritmp"), "--threads", "1"])
    from foldseek_tpu.cli import main as cli
    t0 = time.perf_counter()
    assert cli(["createdb", os.path.join(td, "t.tar"),
                os.path.join(td, "otdb"), "-v", "1"]) == 0
    assert cli(["createdb", os.path.join(td, "q.tar"),
                os.path.join(td, "oqdb"), "-v", "1"]) == 0
    print("our createdb", round(time.perf_counter() - t0, 1), "s")
    print("workspace ready:", td)


if __name__ == "__main__":
    main()
