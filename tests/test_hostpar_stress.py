"""Threading-stress for the host parallel layer (the reference's thread
safety is by construction — per-thread writers + omp critical; our
equivalents are utils/hostpar thread pools over native/numpy per-hit work
and the fork-parallel k-mer prefilter. The round-2 review noted no stress
coverage existed for either)."""
import os

import numpy as np
import pytest

from foldseek_tpu.utils.hostpar import map_queries, n_host_threads


def test_map_queries_ordered_under_contention():
    """Results keep input order and every item runs exactly once even with
    threads racing on shared state."""
    import threading
    hits = []
    lock = threading.Lock()

    def work(x):
        # touch numpy (releases the GIL) + shared state
        v = float(np.linalg.norm(np.full(1000, x, dtype=np.float64)))
        with lock:
            hits.append(x)
        return (x, v)

    items = list(range(500))
    out = map_queries(work, items)
    assert [x for x, _ in out] == items
    assert sorted(hits) == items


def test_map_queries_propagates_exceptions():
    def work(x):
        if x == 37:
            raise ValueError("boom")
        return x
    with pytest.raises(ValueError, match="boom"):
        map_queries(work, range(100))


def test_native_parallel_calls_consistent():
    """Concurrent native-library calls (ctypes releases the GIL) return the
    same values as serial calls — no hidden shared state in the C side."""
    from foldseek_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    mats = [rng.integers(-4, 9, size=(40, 40)).astype(np.int32)
            for _ in range(64)]

    def score(m):
        # banded traceback over a synthetic substitution block; the
        # returned cigar is a pure function of the inputs
        s = int(np.maximum(m, 0).trace())
        if s <= 0:
            return ""
        try:
            return native.banded_sw_bt(m, min(s, int(m.max()) * 5), 10.0, 1.0)
        except Exception:
            return "X"

    serial = [score(m) for m in mats]
    os.environ["FOLDSEEK_TPU_THREADS"] = "16"
    try:
        parallel = map_queries(score, mats)
    finally:
        os.environ.pop("FOLDSEEK_TPU_THREADS", None)
    assert parallel == serial


def test_align_threaded_matches_single_thread(monkeypatch, example_dir,
                                              tmp_path):
    """The full align stage under a forced thread pool equals the 1-thread
    run record-for-record."""
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import search
    files = [str(f) for f in sorted(example_dir.iterdir())
             if "tim" not in f.name][:8]
    db = create_db(files, str(tmp_path / "db"))
    params = SearchParams(add_backtrace=True)
    monkeypatch.setenv("FOLDSEEK_TPU_THREADS", "1")
    r1 = search(db, db, params)
    monkeypatch.setenv("FOLDSEEK_TPU_THREADS", "8")
    r8 = search(db, db, params)

    def fmt(res):
        return {k: [(r.db_key, r.score, r.backtrace) for r in v]
                for k, v in res.items()}
    assert fmt(r1) == fmt(r8)


def test_threads_flag_caps_pool():
    """--threads N (Parameters.cpp PARAM_THREADS) caps the host pool; 0
    restores the auto policy."""
    from foldseek_tpu.utils.hostpar import set_threads
    auto = n_host_threads(64)
    try:
        set_threads(1)
        assert n_host_threads(64) == 1
        set_threads(2)
        assert n_host_threads(64) == min(2, os.cpu_count() or 1, 64)
    finally:
        set_threads(0)
    assert n_host_threads(64) == auto


def test_native_asan_ubsan_sweep():
    """ASan+UBSan build of the native lib driven through the hot entry
    points under a thread pool (the reference's ASanOpt CI analogue,
    azure-pipelines.yml:36-40). Skipped when libasan is unavailable."""
    import os
    import subprocess
    import sys
    asan = subprocess.run(["g++", "-print-file-name=libasan.so"],
                          capture_output=True, text=True).stdout.strip()
    if not asan or not os.path.isabs(asan):
        import pytest
        pytest.skip("libasan unavailable")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "sanitize_native.py")],
        capture_output=True, text=True, timeout=1100)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1000:]
    assert "CLEAN" in r.stdout


def test_native_reverse_pass_ab_harnesses():
    """Standalone A/B harnesses for the AVX2 reverse-SW passes (scalar vs
    epi32 vs epi16) over thousands of randomized cases."""
    import os
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(["sh", os.path.join(repo, "tools", "native_tests",
                                           "run.sh")],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-800:]
    assert r.stdout.count("all ok") == 2
