#!/usr/bin/env python3
"""Per-substage ledger of the 100k-target e2e search (VERDICT r3 task 1).

Replicates bench.py::bench_scale's e2e scenario (16 synthetic queries vs a
100k-entry synthetic DB through the device gapless prefilter + full
structurealign) with debug timers on, then prints a cProfile top-N of the
align stage so the 26-second wall can be attributed substage by substage.
"""
import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foldseek_tpu.utils.jaxcache import enable_compilation_cache
from foldseek_tpu.utils.log import logger
import logging

logger.setLevel(logging.DEBUG)


def main():
    enable_compilation_cache()
    from foldseek_tpu.db.synth import synth_db
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import search

    example = "/root/reference/example"
    files = [os.path.join(example, f) for f in sorted(os.listdir(example))
             if "tim" not in f]
    with tempfile.TemporaryDirectory() as td:
        base = create_db(files, os.path.join(td, "base"))
        t0 = time.perf_counter()
        tdb = synth_db(base, 100_000, os.path.join(td, "t100k"), seed=1)
        qdb16 = synth_db(base, 16, os.path.join(td, "q16"), seed=4)
        print(f"synth_db: {time.perf_counter()-t0:.2f}s", flush=True)
        from foldseek_tpu.db.index import create_index
        t0 = time.perf_counter()
        create_index(tdb)
        print(f"create_index: {time.perf_counter()-t0:.2f}s", flush=True)
        params = SearchParams(prefilter_mode=1, add_backtrace=True)

        # warm run (compiles)
        t0 = time.perf_counter()
        search(qdb16, tdb, params, same_db=False)
        print(f"e2e warm(compile) run: {time.perf_counter()-t0:.2f}s",
              flush=True)

        # profiled warm run
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        res = search(qdb16, tdb, params, same_db=False)
        pr.disable()
        dt = time.perf_counter() - t0
        nhits = sum(len(v) for v in res.values())
        print(f"e2e steady: {dt:.2f}s  ({16/dt:.2f} q/s, {nhits} hits)",
              flush=True)
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(45)
        print(s.getvalue())
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
        ps.print_stats(35)
        print(s.getvalue())


if __name__ == "__main__":
    main()
