"""Differential fuzz vs the reference binary (presence-gated).

Randomized crops+jitter of the example domains through both
implementations: default-search rows must reproduce the reference
byte-exactly (extra hits on our side allowed — the patched reference
build's stubbed block-aligner drops some marginal/short hits its own
prefilter finds); TM-align mode must show no missed hits and no
systematic TM deficit. Runs only when the reference binary exists
(see tests/golden/README.md for the rebuild recipe).
"""
import os
import subprocess
import sys

import pytest

REF_BIN = os.environ.get("FOLDSEEK_REF_BIN", "/tmp/ref/build/src/foldseek")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.isfile(REF_BIN),
                    reason="reference binary not present")
@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="slow: full all-vs-all through both binaries")
def test_fuzz_parity_seeded():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_parity.py"),
         "24", "5"],
        capture_output=True, text=True, timeout=1200,
        env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "BYTE-IDENTICAL" in r.stdout, r.stdout


@pytest.mark.skipif(not os.path.isfile(REF_BIN),
                    reason="reference binary not built")
def test_pssm_prefilter_exact_vs_reference():
    """Full-stack k-mer PSSM prefilter A/B: the reference's own stored
    profile bytes through both its prefilter module and query_pssm must
    produce identical (target, score, diagonal) rows in identical order
    (closed r4: no-ctx threshold branch + chunked-flush semantics)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ab_pssm_prefilter.py"),
         "16", "3"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO))
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-500:]
    assert "RESULT: EXACT" in r.stdout
