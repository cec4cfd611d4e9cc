"""Host-side thread parallelism over per-query work.

The reference wraps every per-query hot loop in `#pragma omp parallel for
schedule(dynamic, 1)` (structurealign.cpp:318, tmalign.cpp:219,
Prefiltering.cpp). The Python analogue: the heavy per-hit work here runs
in the native host library (ctypes calls release the GIL) or in numpy
(most ufuncs release it too), so a thread pool gives real multi-core
scaling without pickling. FOLDSEEK_TPU_THREADS caps the pool.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, List


def n_host_threads(n_items: int) -> int:
    return max(1, min(os.cpu_count() or 1, n_items,
                      int(os.environ.get("FOLDSEEK_TPU_THREADS", "16"))))


def map_queries(fn: Callable, items: Iterable) -> List:
    """Ordered map of fn over items, thread-parallel when it helps."""
    items = list(items)
    n = n_host_threads(len(items))
    if n <= 1:
        return [fn(x) for x in items]
    with ThreadPoolExecutor(n) as ex:
        return list(ex.map(fn, items))
