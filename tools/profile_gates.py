#!/usr/bin/env python3
"""Attribute the device TM/LDDT gate stage cost (VERDICT r4 task 1 ledger).

Synthesizes a 16k-pair survivor fleet with the scale run's length mix and
times: H2D transfer, TM kernel, LDDT kernel, readbacks — per m_pad bucket.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from foldseek_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from foldseek_tpu.ops.lddt import batched_lddt_device
from foldseek_tpu.ops.tm_device import SIMPLIFY_STEP, batched_tm_device

rng = np.random.RandomState(0)


def fleet(P, m_pad):
    m_len = rng.randint(max(8, m_pad // 3), m_pad + 1, P).astype(np.int32)
    qa = rng.randn(P, m_pad, 3).astype(np.float32) * 10
    # target = query + noise so superpositions are realistic
    ta = qa + rng.randn(P, m_pad, 3).astype(np.float32) * 1.5
    deg = rng.randint(1, 20, (P, m_pad)).astype(np.float32)
    norm = rng.randint(m_pad // 2, m_pad * 2, P).astype(np.int32)
    return qa, ta, deg, m_len, norm


def timed(label, fn, reps=3):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {best*1000:.0f} ms", flush=True)
    return best


def main():
    # scale-run-like fleet: ~16k pairs mostly in the 256 bucket
    for m_pad, P in ((64, 3000), (256, 13000)):
        print(f"bucket m_pad={m_pad} P={P}:", flush=True)
        qa, ta, deg, m_len, norm = fleet(P, m_pad)
        s_max = max(1, (m_pad - 1) // SIMPLIFY_STEP + 2)
        chunk_tm = int(max(8, min(512, (1 << 25) // max(1, 12 * s_max * m_pad))))
        chunk_l = max(8, min(256, (1 << 26) // max(1, m_pad * m_pad * 4)))
        print(f"  chunk_tm={chunk_tm} chunk_lddt={chunk_l}")

        def h2d():
            a = jnp.asarray(qa); b = jnp.asarray(ta); c = jnp.asarray(deg)
            jax.block_until_ready((a, b, c))
        timed("H2D qa+ta+deg", h2d)

        timed("tm kernel (incl readback)",
              lambda: batched_tm_device(ta, qa, m_len, norm, chunk=chunk_tm))
        timed("lddt kernel (incl readback)",
              lambda: batched_lddt_device(qa, ta, deg, m_len, chunk=chunk_l))


if __name__ == "__main__":
    main()
