#!/usr/bin/env python3
"""Benchmark: ungapped prefilter GCUPS per chip (the north-star metric).

Measures the gapless diagonal-scoring kernel — the reference's GPU prefilter
equivalent (libmarv `Marv::scan` reports GCUPS per scan,
lib/mmseqs/lib/libmarv/src/marv.h:30-35) — on one TPU chip, counting true DP
cells.

Methodology: the backend here is a remote tunnel with lazy dispatch and
result caching, so (a) every input is unique and used once, (b) the work for
N batches runs inside ONE jitted scan, (c) timing requires a result readback,
and (d) the fixed round-trip cost is removed by differencing two run sizes:
  gcups = (N2 - N1) * cells_per_batch / (t(N2) - t(N1))

Baseline: the reference's own CPU ungapped prefilter (`foldseek
ungappedprefilter`, SSE2 byte SIMD) measured on this machine's single core:
~22 GCUPS. (README.md:413 claims an RTX 4090 is 4x a 64-core CPU, i.e.
~5600 GCUPS by the same yardstick.)

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import functools
import json
import time

import numpy as np

REFERENCE_CPU_1CORE_GCUPS = 22.0


def wait_for_device(budget_s: float = 1800.0, probe_timeout_s: float = 90.0):
    """Gate the measurement on a healthy device: probe with a small matmul
    readback in a SUBPROCESS under a timeout (a wedged remote-dispatch
    tunnel hangs the caller forever, so the probe must be killable), retry
    until the budget runs out. Returns True when a probe succeeded; after
    the budget, proceed anyway — on local TPU hardware the first probe
    succeeds in seconds and this is a no-op."""
    import subprocess
    import sys
    code = ("import jax, numpy as np;"
            "x = jax.numpy.ones((256, 256), jax.numpy.bfloat16);"
            "print(float(np.asarray((x @ x).sum())))")
    deadline = time.monotonic() + budget_s
    fast_failures = 0
    while True:
        t0 = time.monotonic()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
            # a fast nonzero exit is a broken environment, not a wedged
            # tunnel — waiting won't fix it; surface the error and move on
            if time.monotonic() - t0 < 10.0:
                fast_failures += 1
                if fast_failures >= 3:
                    print("bench: device probe fails immediately; "
                          f"stderr: {r.stderr.decode()[-300:]}",
                          file=sys.stderr, flush=True)
                    return False
        except subprocess.TimeoutExpired:
            fast_failures = 0
        if time.monotonic() >= deadline:
            print(f"bench: device probe never succeeded within "
                  f"{budget_s:.0f}s; emitting a null record",
                  file=sys.stderr, flush=True)
            return False
        time.sleep(min(60.0, max(5.0, deadline - time.monotonic())))


def probe_rtt_ms(n: int = 5):
    """Tunnel-health telemetry: time n tiny device readbacks; the median is
    the fixed round-trip cost, max/median >> 1 means the tunnel is stalling.
    Returns (median_ms, max_ms)."""
    import jax
    import jax.numpy as jnp
    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: (a @ a).sum())
    float(np.asarray(f(x)))  # compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        times.append((time.perf_counter() - t0) * 1000.0)
    return round(float(np.median(times)), 2), round(max(times), 2)


def rep_until_converged(fn, rel_tol: float = 0.15, max_reps: int = 8,
                        budget_s: float = 600.0):
    """Repeat fn() until two CONSECUTIVE reps agree within rel_tol (their
    spread over their min), then return the faster of the pair. A 20-second
    measurement through a lazily-warming remote tunnel descends for several
    reps (r4 recorded 58.7 -> 42.1 -> 22.5 s, still falling, as the steady
    state); best-of-k cannot distinguish "still warming" from "steady".
    Returns (value_s, reps list, converged bool)."""
    reps = []
    t_start = time.monotonic()
    while len(reps) < max_reps:
        t0 = time.perf_counter()
        fn()
        reps.append(time.perf_counter() - t0)
        if (len(reps) >= 2
                and abs(reps[-1] - reps[-2]) / max(min(reps[-1], reps[-2]),
                                                   1e-9) <= rel_tol):
            return min(reps[-1], reps[-2]), reps, True
        if time.monotonic() - t_start > budget_s:
            break
    return min(reps), reps, False


def main():
    from foldseek_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    device_ok = wait_for_device()
    if not device_ok:
        # the device is unreachable: there is nothing meaningful to
        # measure (the Pallas kernels only interpret on CPU), and any
        # device dispatch would hang forever. Emit a clearly-marked
        # null record instead of hanging the driver.
        print(json.dumps({"metric": "prefilter_gcups_per_chip",
                          "value": 0, "unit": "GCUPS", "vs_baseline": 0,
                          "device_unhealthy": True}))
        return
    import jax
    import jax.numpy as jnp

    from foldseek_tpu.ops.gapless_pallas import (gapless_scores_batch,
                                                 pack_profiles_batch)
    from foldseek_tpu.ops.matrices import mat3di

    rng = np.random.RandomState(7)
    Lq = 383  # lq_pad 384 with the mandatory trailing pad row
    B = 2048
    Lt = 384
    Q = 8  # queries per stack (q * lq_pad = 3072 rows, the VMEM budget)

    m3 = mat3di(2.0, 0.0)
    profs = [m3.scores[:, rng.randint(0, 20, Lq)].astype(np.float32)
             for _ in range(Q)]
    stack, caps, lq_pad = pack_profiles_batch(profs, [225.0] * Q)
    stack_dev = jnp.asarray(stack)
    caps_dev = jnp.asarray(caps)

    def make_many(n_batches):
        # targets are generated on-device from a seed so the timed region
        # contains no host->device payload, only compute (+ fixed RTT)
        @jax.jit
        def many(stack_dev, caps_dev, seed):
            def body(key, _):
                key, k1 = jax.random.split(key)
                t_T = jax.random.randint(k1, (Lt, B), 0, 20, dtype=jnp.int32)
                return key, gapless_scores_batch(stack_dev, t_T, caps_dev,
                                                 Q, lq_pad)
            _, out = jax.lax.scan(body, jax.random.PRNGKey(seed), None,
                                  length=n_batches)
            return out
        return many

    # the tunnel stalls for seconds at random; r02's n=(2,10) differencing
    # measured ~0.2 s of real compute, so stalls swung the estimate by
    # +-25% (recorded 419 vs 520-560 measured on a healthy tunnel). Sizing
    # the differenced work to seconds of device time bounds a stall's
    # relative error instead.
    n1, n2 = 60, 240
    # only real query rows count as useful cells (not the stack padding)
    cells_per_batch = B * Q * Lq * Lt
    # compile/load both executables ONCE (a fresh closure per round would
    # re-trace and reload through the tunnel inside the timed window)
    many_fns = {n: make_many(n) for n in (n1, n2)}
    for n, f in many_fns.items():
        np.asarray(f(stack_dev, caps_dev, 0))
    stall_count = 0

    def run(n_batches, round_i):
        nonlocal stall_count
        f = many_fns[n_batches]
        times = []
        for rep in range(5):
            t0 = time.perf_counter()
            np.asarray(f(stack_dev, caps_dev, 17 * round_i + rep + 1))
            times.append(time.perf_counter() - t0)
        stall_count += sum(1 for t in times if t > 1.5 * min(times))
        return min(times)

    extra = {}
    try:
        rtt_med, rtt_max = probe_rtt_ms()
        extra["tunnel_rtt_ms_median"] = rtt_med
        extra["tunnel_rtt_ms_max"] = rtt_max
    except Exception as e:
        extra["rtt_error"] = str(e)[:200]
    extra.update(bench_e2e())
    try:
        extra.update(bench_aligners())
    except Exception as e:
        extra["aligners_error"] = str(e)[:200]
    try:
        extra.update(bench_scale())
    except Exception as e:  # scale is auxiliary; never fail the line
        extra["scale_error"] = str(e)[:200]
    # rep-until-converged differencing: keep taking differenced estimates
    # until two consecutive rounds agree within 10% (a stall inside either
    # run of a round distorts that round; consecutive agreement means the
    # tunnel was quiet for both). Median of all rounds is the fallback.
    estimates = []
    converged = False
    for round_i in range(8):
        t1 = run(n1, round_i)
        t2 = run(n2, round_i)
        estimates.append(
            (n2 - n1) * cells_per_batch / max(t2 - t1, 1e-9) / 1e9)
        if (len(estimates) >= 2
                and abs(estimates[-1] - estimates[-2])
                / min(estimates[-1], estimates[-2]) <= 0.10):
            converged = True
            break
    if converged:
        gcups = float(0.5 * (estimates[-1] + estimates[-2]))
    else:
        gcups = float(np.median(estimates))
    out = {
        "metric": "prefilter_gcups_per_chip",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / REFERENCE_CPU_1CORE_GCUPS, 2),
        "gcups_estimates": [round(e, 1) for e in estimates],
        "gcups_converged": converged,
        "gcups_stall_reps": stall_count,
    }
    out.update(extra)
    print(json.dumps(out))


# Reference easy-search (search+convertalis, createdb excluded) on the 26
# SCOP example domains all-vs-all, single thread on this machine's CPU:
# 3.75 s = 6.9 queries/s (foldseek search+convertalis --threads 1).
REFERENCE_E2E_SCOP_SECONDS = 3.75


def bench_e2e():
    """End-to-end SCOP 26x26 all-vs-all search queries/s (default k-mer
    prefilter mode, createdb excluded, warm steady state — kernel compiles
    are amortized by the persistent compilation cache)."""
    import os
    import tempfile

    example = "/root/reference/example"
    if not os.path.isdir(example):
        return {}
    try:
        from foldseek_tpu.ingest.createdb import create_db
        from foldseek_tpu.search.params import SearchParams
        from foldseek_tpu.search.pipeline import search
        files = [os.path.join(example, f) for f in sorted(os.listdir(example))
                 if "tim" not in f]
        with tempfile.TemporaryDirectory() as td:
            db = create_db(files, os.path.join(td, "scopdb"))
            params = SearchParams(add_backtrace=True)
            search(db, db, params)  # warm (compile)
            best, reps, conv = rep_until_converged(
                lambda: search(db, db, params), max_reps=6, budget_s=240.0)
        qps = db.size / best
        return {
            "e2e_scop_ava_seconds": round(best, 2),
            "e2e_scop_ava_queries_per_sec": round(qps, 2),
            "e2e_scop_ava_converged": conv,
            "e2e_vs_reference_1thread": round(
                qps / (26.0 / REFERENCE_E2E_SCOP_SECONDS), 2),
        }
    except Exception as e:  # e2e is auxiliary; never fail the bench line
        return {"e2e_error": str(e)[:200]}



# Reference binary aligner-module times on this host (single core,
# 26-domain SCOP all-vs-all = 673 accepted pairs, measured 2026-08-18):
# tmalign module 7.343 s, lolalign module 2.889 s.
REFERENCE_TMALIGN_MS_PER_PAIR = 7343.0 / 673
REFERENCE_LOLALIGN_MS_PER_PAIR = 2889.0 / 673


def bench_aligners():
    """Host aligner engines over the SCOP all-vs-all accepted pairs:
    full TM-align (--alignment-type 1) and LoLalign (--alignment-type 3)
    ms/pair vs the reference binary's module times on the same host."""
    import os
    import tempfile

    example = "/root/reference/example"
    if not os.path.isdir(example):
        return {}
    import numpy as _np

    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.ops.lolalign import LoLAligner
    from foldseek_tpu.ops.matrices import blosum62
    from foldseek_tpu.ops.tmalign import tmalign

    files = [os.path.join(example, f) for f in sorted(os.listdir(example))
             if "tim" not in f]
    out = {}
    with tempfile.TemporaryDirectory() as td:
        db = create_db(files, os.path.join(td, "scopdb"))
        pairs = [(q, t) for q in range(db.size) for t in range(db.size)]
        cas = [_np.asarray(db.get_ca(i), dtype=_np.float32)
               for i in range(db.size)]
        aas = [_np.asarray(db.get_aa(i)) for i in range(db.size)]
        sss = [_np.asarray(db.get_ss(i)) for i in range(db.size)]
        # best-of-2 passes: these are host-only loops, but the driver
        # environment showed ~8% slowdowns (r4 lolalign 0.98x vs 1.06x
        # measured) — one competing process during a single pass is enough
        dt_tm = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for q, t in pairs:
                tmalign(cas[q], cas[t], aas[q], aas[t])
            dt_tm = min(dt_tm, time.perf_counter() - t0)
        out["tmalign_ms_per_pair"] = round(dt_tm / len(pairs) * 1000, 2)
        out["tmalign_vs_reference_1thread"] = round(
            REFERENCE_TMALIGN_MS_PER_PAIR
            / (dt_tm / len(pairs) * 1000), 2)

        sub = blosum62(1.4).scores.astype(_np.float32)
        dt_lol = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for q in range(db.size):
                lol = LoLAligner(multi_domain=True)
                lol.init_query(cas[q], aas[q], sss[q], sub)
                for t in range(db.size):
                    lol.align(cas[t], aas[t], sss[t])
            dt_lol = min(dt_lol, time.perf_counter() - t0)
        out["lolalign_ms_per_pair"] = round(dt_lol / len(pairs) * 1000, 2)
        out["lolalign_vs_reference_1thread"] = round(
            REFERENCE_LOLALIGN_MS_PER_PAIR
            / (dt_lol / len(pairs) * 1000), 2)
    return out


# Reference binary on the SAME synthetic 100k DB (seeds 1/4 exported as
# CA-only PDB tars), single thread, prebuilt .idx: search 8.11 s +
# convertalis 0.05 s for the 16-query set / 16000 hits (measured 2026-08-19,
# tools/bench_reference_scale.py; createdb 107 s / createindex 107 s
# excluded on both sides — our index build: 29 s).
REFERENCE_SCALE_100K_E2E_SECONDS = 8.16


def bench_scale():
    """BASELINE config 5 analogue on one chip: a synthetic 100k-entry DB
    (SCOP-derived length/composition mix, db/synth.py) searched end-to-end
    — 64 queries through the device gapless prefilter (the --gpu mode,
    StructureSearch.cpp:110-112) + full structurealign, plus a
    prefilter-only rate, a reference-binary yardstick ratio at the same
    scale, a 1M-target prefilter scan + RAM model, and peak host RSS."""
    import os
    import tempfile
    import time as _t

    example = "/root/reference/example"
    if not os.path.isdir(example):
        return {}
    from foldseek_tpu.db.synth import peak_rss_mb, synth_db
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import search
    from foldseek_tpu.search.ungapped import UngappedPrefilter

    out = {}
    files = [os.path.join(example, f) for f in sorted(os.listdir(example))
             if "tim" not in f]
    with tempfile.TemporaryDirectory() as td:
        base = create_db(files, os.path.join(td, "base"))
        tdb = synth_db(base, 100_000, os.path.join(td, "t100k"), seed=1)
        qdb = synth_db(base, 64, os.path.join(td, "q64"), seed=2)
        params = SearchParams(prefilter_mode=1, add_backtrace=True)

        # precomputed target index (panels), the reference's createindex
        # amortization (data/structureindex.sh); built once, reused by
        # every search below
        from foldseek_tpu.db.index import create_index
        t0 = _t.perf_counter()
        create_index(tdb)
        out["scale_100k_index_seconds"] = round(_t.perf_counter() - t0, 2)

        pref = UngappedPrefilter(tdb)
        seqs = [np.asarray(qdb.get_ss(i)) for i in range(qdb.size)]
        pref.query_batch(seqs, params)  # warm/compile the full stack set
        t0 = _t.perf_counter()
        pref.query_batch(seqs, params)
        dt = _t.perf_counter() - t0
        out["scale_100k_prefilter_qps"] = round(qdb.size / dt, 2)

        # e2e over a 16-query slice (the 64-query version is ~5 min of
        # which most is per-process compile/load through the tunnel; the
        # per-query rate is what matters and the fleet still exceeds the
        # device-gate threshold). Cold = first call in this process
        # (compile-cache warm from the runs above, CA panel + kernels
        # first-contact); steady = rep-until-converged — the r4 ledger
        # recorded 58.7 -> 42.1 -> 22.5 s reps still monotonically
        # falling under best-of-2, i.e. executable loads + tunnel warmup
        # were charged to the engine.
        qdb16 = synth_db(base, 16, os.path.join(td, "q16"), seed=4)
        t0 = _t.perf_counter()
        res = search(qdb16, tdb, params, same_db=False)
        out["scale_100k_e2e_cold_seconds"] = round(_t.perf_counter() - t0, 2)

        from foldseek_tpu.utils.log import (reset_stage_times,
                                            snapshot_stage_times)
        res_box = {}

        def one_rep():
            reset_stage_times()
            res_box["res"] = search(qdb16, tdb, params, same_db=False)
        dt, reps, conv = rep_until_converged(one_rep, max_reps=10,
                                             budget_s=900.0)
        res = res_box["res"]
        stages = snapshot_stage_times()  # attribution of the LAST rep
        out["scale_100k_e2e_qps"] = round(qdb16.size / dt, 2)
        out["scale_100k_e2e_seconds"] = round(dt, 2)
        out["scale_100k_e2e_reps"] = [round(r, 2) for r in reps]
        out["scale_100k_e2e_converged"] = conv
        # substage attribution (seconds, last rep): where a stalled run
        # lost its time — device prefilter, SW launches, host per-hit
        # loop, native batched tracebacks, device TM/LDDT drain
        for k_out, k_in in (("scale_100k_prefilter_s", "prefilter"),
                            ("scale_100k_sw_s", "sw_scoring"),
                            ("scale_100k_host_loop_s", "host_loop"),
                            ("scale_100k_recover_s", "batch_recover"),
                            ("scale_100k_gates_s", "gates_drain")):
            if k_in in stages:
                out[k_out] = round(stages[k_in], 2)
        out["scale_100k_hits"] = int(sum(len(v) for v in res.values()))
        out["scale_100k_vs_reference_1thread"] = round(
            REFERENCE_SCALE_100K_E2E_SECONDS / dt, 2)

        # 1M-target prefilter scan + RAM model (always recorded since r4;
        # FOLDSEEK_TPU_BENCH_NO_1M=1 skips on small hosts). The reference's
        # RAM model is (6 B Calpha + 1 B 3Di + 1 B AA) per DB residue
        # (README.md:95); this build's prefilter-resident footprint is the
        # int8 3Di panel + postings, measured as the RSS delta of
        # constructing the prefilter over the 1M DB.
        if not os.environ.get("FOLDSEEK_TPU_BENCH_NO_1M"):
            from foldseek_tpu.db.synth import current_rss_mb
            tdb1m = synth_db(base, 1_000_000, os.path.join(td, "t1m"), seed=3)
            rss0 = current_rss_mb()
            pref1m = UngappedPrefilter(tdb1m)
            host_mb = current_rss_mb() - rss0
            residues = int(tdb1m.total_residues)
            out["scale_1m_residues"] = residues
            out["scale_1m_prefilter_host_bytes_per_residue"] = round(
                host_mb * 1e6 / max(residues, 1), 2)
            pref1m.query_batch(seqs[:4], params)
            t0 = _t.perf_counter()
            pref1m.query_batch(seqs, params)
            dt = _t.perf_counter() - t0
            out["scale_1m_prefilter_qps"] = round(qdb.size / dt, 2)
            # 1M end-to-end (16 queries), same convergence discipline;
            # the r4 one-off manual note (4.48 s steady) becomes a
            # recorded ledger field
            create_index(tdb1m)
            search(qdb16, tdb1m, params, same_db=False)  # warm
            dt, reps, conv = rep_until_converged(
                lambda: search(qdb16, tdb1m, params, same_db=False),
                max_reps=6, budget_s=400.0)
            out["scale_1m_e2e_seconds"] = round(dt, 2)
            out["scale_1m_e2e_qps"] = round(qdb16.size / dt, 2)
            out["scale_1m_e2e_converged"] = conv
        out["scale_peak_host_mb"] = round(peak_rss_mb(), 1)
    return out


if __name__ == "__main__":
    main()
