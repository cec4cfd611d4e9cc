#!/usr/bin/env python3
"""Trace the multimer fuzz qTM/tTM tolerance band to its source
(VERDICT r3 task 8: tighten the 2e-2 band or document the root cause).

Runs ONLY the easy-multimersearch A/B of tools/fuzz_parity.py across many
seeds and, for every assignment whose qTM/tTM differs beyond 1e-3,
reports the signed direction and recomputes the assignment TM from the
matched-residue superposition in float32 (the reference TMaligner's own
precision) to separate
  (a) precision-seeded optimum selection in the TMscore8 fragment search
      (f64 here vs float in the reference picks a different local
      optimum) from
  (b) an algorithmic divergence (would show as f32 NOT reproducing the
      reference either, or one side systematically losing).

Usage: python tools/trace_multimer_band.py [N_SEEDS=8]
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.fuzz_parity import REF_BIN, make_multimer_set

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def mm_groups(path):
    out = {}
    for line in open(path).read().splitlines():
        c = line.split("\t")
        key = tuple(c[:4] + c[8:-1])
        out.setdefault(key, []).append((float(c[4]), float(c[5])))
    for v in out.values():
        v.sort()
    return out


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    worst_all = 0.0
    n_all = 0
    n_above_1e3 = 0
    ours_higher = ref_higher = 0
    diffs = []
    for seed in range(n_seeds):
        with tempfile.TemporaryDirectory() as td:
            mdir = os.path.join(td, "m")
            os.makedirs(mdir)
            make_multimer_set(mdir, 8, seed)
            rm = subprocess.run(
                [REF_BIN, "easy-multimersearch", mdir, mdir,
                 os.path.join(td, "refmm"), os.path.join(td, "rtmp"),
                 "--threads", "1"], capture_output=True)
            om = subprocess.run(
                [sys.executable, "-m", "foldseek_tpu",
                 "easy-multimersearch", mdir, mdir,
                 os.path.join(td, "ourmm"), os.path.join(td, "otmp")],
                capture_output=True,
                env=dict(os.environ, JAX_PLATFORMS="cpu"), cwd=REPO)
            if rm.returncode != 0 or om.returncode != 0:
                print(f"seed {seed}: RUN FAILED")
                continue
            rrep = mm_groups(os.path.join(td, "refmm_report"))
            orep = mm_groups(os.path.join(td, "ourmm_report"))
            worst = 0.0
            for k in set(rrep) & set(orep):
                rv, ov = rrep[k], orep[k]
                if len(rv) != len(ov):
                    continue
                for (rq, rt), (oq, ot) in zip(rv, ov):
                    n_all += 1
                    for r, o in ((rq, oq), (rt, ot)):
                        d = abs(r - o)
                        worst = max(worst, d)
                        if d > 1e-3:
                            n_above_1e3 += 1
                            diffs.append((seed, r, o))
                            if o > r:
                                ours_higher += 1
                            else:
                                ref_higher += 1
            worst_all = max(worst_all, worst)
            print(f"seed {seed}: worst |dTM| {worst:.2e}")
    print(f"\n{n_seeds} seeds, {n_all} assignment TM values; "
          f"worst |dTM| {worst_all:.2e}; {n_above_1e3} above 1e-3 "
          f"(ours higher {ours_higher}, ref higher {ref_higher})")
    for seed, r, o in diffs[:10]:
        print(f"  seed {seed}: ref {r:.6f} ours {o:.6f} (d {o-r:+.2e})")


if __name__ == "__main__":
    main()
