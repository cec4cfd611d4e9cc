#!/usr/bin/env python3
"""Benchmark: ungapped prefilter GCUPS per chip (the north-star metric).

Measures the gapless diagonal-scoring kernel — the reference's GPU prefilter
equivalent (libmarv `Marv::scan` reports GCUPS per scan,
lib/mmseqs/lib/libmarv/src/marv.h:30-35) — on one TPU chip against a synthetic
length-realistic target batch, counting true (unpadded) DP cells.

Baseline: the reference's own CPU ungapped prefilter (`foldseek
ungappedprefilter`, SSE2 byte SIMD) measured on this machine's single core at
~22 GCUPS (200x2000 entries of length 300, user time). The README's GPU
claim is 4x a 64-core CPU (~ #cores x single-core), i.e. RTX 4090 ~= 5600
GCUPS by that yardstick.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

REFERENCE_CPU_1CORE_GCUPS = 22.0


def main():
    import jax
    import jax.numpy as jnp

    from foldseek_tpu.ops.gapless import combine_profiles, gapless_scores_only
    from foldseek_tpu.ops.sw import QueryProfile

    rng = np.random.RandomState(7)
    Lq = 384
    B = 2048
    Lt = 384
    chunk = 128

    q_aa = rng.randint(0, 20, Lq).astype(np.int8)
    q_ss = rng.randint(0, 20, Lq).astype(np.int8)
    prof = QueryProfile(q_aa, q_ss)
    pa, ps = prof.padded(Lq)
    prof2 = jnp.asarray(combine_profiles(pa, ps))

    # unique single-use target batches: rules out any dispatch/result caching
    # in the backend; pipelined dispatch + sync on ALL outputs
    iters = 32
    batches = [
        (jnp.asarray(rng.randint(0, 20, (B, Lt)).astype(np.int8)),
         jnp.asarray(rng.randint(0, 20, (B, Lt)).astype(np.int8)))
        for _ in range(iters)
    ]
    t_len = jnp.full((B,), Lt, dtype=jnp.int32)

    # warmup / compile
    s = gapless_scores_only(prof2, *batches[-1], t_len, chunk=chunk)
    s.block_until_ready()

    # median of 5 repeats — the remote-tunnel dispatch latency is noisy
    reps = []
    for _ in range(5):
        outs = []
        t0 = time.perf_counter()
        for taa, tss in batches:
            outs.append(gapless_scores_only(prof2, taa, tss, t_len, chunk=chunk))
        for o in outs:
            o.block_until_ready()
        reps.append((time.perf_counter() - t0) / iters)
    dt = sorted(reps)[len(reps) // 2]

    cells = B * Lq * Lt
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "prefilter_gcups_per_chip",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / REFERENCE_CPU_1CORE_GCUPS, 2),
    }))


if __name__ == "__main__":
    main()
