#!/usr/bin/env python3
"""Attribute the fused device TM/LDDT gate stage cost (ops/gates_device).

Synthesizes a 16k-pair survivor fleet with the scale run's length mix and
times the fused dispatch+drain per m_pad bucket, plus the kernels in
isolation."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from foldseek_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from foldseek_tpu.ops.gates_device import GateFleet

rng = np.random.RandomState(0)


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
    # resident "target panel" + query coords
    Rt, Rq = 3_000_000, 4000
    t_panel = jnp.asarray(rng.randn(Rt, 3).astype(np.float32) * 10)
    q_coords = jnp.asarray(rng.randn(Rq, 3).astype(np.float32) * 10)
    q_deg = jnp.asarray(rng.randint(1, 20, Rq).astype(np.float32))
    jax.block_until_ready((t_panel, q_coords, q_deg))

    for m_pad, P in ((64, 3000), (256, 13000)):
        print(f"bucket m_pad={m_pad} P={P}:", flush=True)

        def build():
            fleet = GateFleet(m_pad, P, True, True)
            m = rng.randint(max(8, m_pad // 3), m_pad + 1, P)
            for j in range(P):
                fleet.qabs[j, :m[j]] = np.sort(
                    rng.choice(Rq, m[j], replace=False))
                fleet.tabs[j, :m[j]] = rng.randint(0, Rt - m_pad) \
                    + np.arange(m[j])
                fleet.m_len[j] = m[j]
                fleet.norm[j] = max(1, int(m[j] * 1.2))
            return fleet

        fleet = build()
        print(f"  chunk_tm={fleet.chunk_tm} chunk_lddt={fleet.chunk_lddt}")

        def run():
            fleet.dispatch(t_panel, q_coords, q_deg)
            return fleet.result()
        timed("fused dispatch+drain", run)


if __name__ == "__main__":
    main()
