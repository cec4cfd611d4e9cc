"""Multi-host distribution: jax.distributed + per-host shard loading.

The reference distributes with MPI — target-DB splits assigned round-robin
to ranks, each rank computing its split and the master merging hit lists
through the shared filesystem (reference:
lib/mmseqs/src/prefiltering/Prefiltering.cpp:589-700 runMpiSplits,
lib/mmseqs/src/commons/MMseqsMPI.cpp:10-27; workflow scripts prefix heavy
stages with $RUNNER, data/structuresearch.sh:46).

TPU-native replacement: `jax.distributed.initialize` forms one global mesh
over every host's chips; each host packs ONLY its row range of the target
panel into its local HBM (`jax.make_array_from_process_local_data` — no
host ever touches another host's shard), queries are replicated, and the
per-device top-k merges with one `all_gather` collective over ICI/DCN — no
shared-filesystem round trip, no master rank. The same code path runs
single-process multi-device (the dryrun mesh) and multi-host.

Launch each host with either explicit arguments or the standard JAX env
(JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID), then call
`init_distributed()` before any other JAX usage.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ..utils.log import logger

ROW_MULTIPLE = 128  # kernel block width; also the per-device row granularity


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None) -> int:
    """Initialize jax.distributed from args or the JAX_* env; returns the
    process id. Safe to call when single-process (no coordinator set):
    does nothing and returns 0."""
    import jax
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return 0
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("JAX_PROCESS_ID", "0")))
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    logger.info("jax.distributed: process %d/%d via %s",
                process_id, num_processes, coordinator)
    return process_id


def host_row_range(n_pad: int, mesh) -> tuple:
    """Row range [start, end) of the global panel owned by this process's
    devices (rows are distributed contiguously over the db axis)."""
    import jax
    n_dev = mesh.devices.size
    per_dev = n_pad // n_dev
    local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    dev_pos = {d: i for i, d in enumerate(mesh.devices.flat)}
    starts = [dev_pos[d] * per_dev for d in local]
    return min(starts), max(starts) + per_dev


def shard_targets_per_host(tdb, mesh, lt_pad: Optional[int] = None):
    """Per-host shard loading of the transposed 3Di panel: this process
    reads ONLY its own row range from the DB (mmap-backed, so untouched
    rows never leave disk) and contributes it to the global sharded array.

    Returns a parallel.mesh.ShardedTargets with globally-sharded arrays."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..db.panels import PAD_LETTER
    from .mesh import DB_AXIS, ShardedTargets

    n = tdb.size
    lens = tdb.lengths()
    if lt_pad is None:
        lt_pad = int(-(-int(lens.max()) // 128) * 128)
    n_dev = mesh.devices.size
    per_dev = -(-(-(-n // n_dev)) // ROW_MULTIPLE) * ROW_MULTIPLE
    n_pad = per_dev * n_dev
    r0, r1 = host_row_range(n_pad, mesh)

    local_rows = r1 - r0
    ss = np.full((local_rows, lt_pad), PAD_LETTER, dtype=np.int32)
    keys = np.full(local_rows, -1, dtype=np.int64)
    for row in range(r0, min(r1, n)):
        L = min(int(lens[row]), lt_pad)
        ss[row - r0, :L] = tdb.get_ss(row)[:L]
        keys[row - r0] = int(tdb.keys[row])
    panel_shard = NamedSharding(mesh, P(None, DB_AXIS))
    key_shard = NamedSharding(mesh, P(DB_AXIS))
    ss_T = jax.make_array_from_process_local_data(
        panel_shard, np.ascontiguousarray(ss.T), (lt_pad, n_pad))
    keys_g = jax.make_array_from_process_local_data(key_shard, keys, (n_pad,))
    logger.info("host %d loads panel rows [%d, %d) of %d",
                jax.process_index(), r0, r1, n_pad)
    return ShardedTargets(mesh=mesh, ss_T=ss_T, keys=keys_g,
                          n_total=n, lt_pad=lt_pad)


def distributed_search(qdb, tdb, params, mesh=None,
                       same_db: Optional[bool] = None):
    """Multi-host end-to-end search: the prefilter scans the host-sharded
    target panel on every chip (DistributedPrefilter), then the align
    stage — PairScorer, backtrace, TM/LDDT — is sharded by QUERY across
    processes (each host aligns queries process_id::num_processes against
    its full mmap of the target DB, the reference's omp-for over queries
    lifted to hosts; $RUNNER on structurealign, data/structuresearch.sh:50)
    and the per-host alignment records are merged with one
    process_allgather. Single-process meshes take the same code path with
    the gather a no-op, so the driver dryrun exercises exactly this.

    Returns the full {qkey: [AlnResult]} on every process."""
    import jax

    from ..search.align import align_all
    from ..search.results import result_to_line
    from ..search.resultdb import parse_result_line

    if same_db is None:
        same_db = qdb.path == tdb.path
    pref_obj = DistributedPrefilter(tdb, mesh)
    seqs = [np.asarray(qdb.get_ss(i)) for i in range(qdb.size)]
    hits = pref_obj.query_batch(seqs, params)
    pref = {int(qdb.keys[qi]): [t for t, _ in hits[qi]]
            for qi in range(qdb.size)}

    return sharded_align_all(qdb, tdb, pref, params, same_db=same_db)


def sharded_align_all(qdb, tdb, prefilter, params, same_db=None,
                      query_profiles=None, stage_fn=None):
    """Query-sharded align stage: each process runs align_all on its slice
    of the (sorted) query keys against its full target mmap (the
    reference's $RUNNER on structurealign, data/structuresearch.sh:50;
    also the cluster cascade's and multimer expansion's heavy stage —
    data/structurecluster.sh:95, data/multimersearch.sh:27), then the
    per-host alignment records are merged with one process_allgather so
    every process returns the full, identical {qkey: [AlnResult]}.
    Single-process: plain align_all, gather skipped (the dryrun path)."""
    import jax

    from ..search.align import align_all
    from ..search.results import result_to_line
    from ..search.resultdb import parse_result_line

    if same_db is None:
        same_db = qdb.path == tdb.path
    pid = jax.process_index()
    nproc = jax.process_count()
    my_pref = {qk: cands
               for i, (qk, cands) in enumerate(sorted(prefilter.items()))
               if i % nproc == pid}
    if stage_fn is not None:
        # alternative per-hit aligner with the align_all signature minus
        # query_profiles (tmalign_all / lolalign_all stages)
        mine = stage_fn(qdb, tdb, my_pref, params, same_db=same_db)
    else:
        mine = align_all(qdb, tdb, my_pref, params, same_db=same_db,
                         query_profiles=query_profiles)
    if nproc == 1:
        return mine

    # merge: serialize this host's records, allgather the byte buffers
    # (bulk data rides the DCN collective, not a shared filesystem)
    from jax.experimental import multihost_utils
    lines = []
    for qk in sorted(mine):
        for r in mine[qk]:
            lines.append(f"{qk}\t{result_to_line(r, True)}")
    blob = ("\n".join(lines)).encode()
    n = np.zeros(nproc, dtype=np.int64)
    n[pid] = len(blob)
    sizes = np.asarray(multihost_utils.process_allgather(n)).sum(axis=0)
    cap = int(sizes.max()) if len(sizes) else 0
    buf = np.zeros((1, max(cap, 1)), dtype=np.uint8)
    buf[0, :len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(nproc, -1)
    out = {int(qk): [] for qk in prefilter}
    for p in range(nproc):
        text = bytes(gathered[p][: int(sizes[p])]).decode()
        for line in text.splitlines():
            if not line:
                continue
            qk, r = parse_result_line(line)
            out.setdefault(qk, []).append(r)
    return out


def alignment_backend():
    """align_all, lifted across processes when a jax.distributed world is
    active — the $RUNNER-prefix analogue workflows use to distribute their
    heavy align stages without changing call sites."""
    try:
        import jax
        if jax.process_count() > 1:
            return sharded_align_all
    except Exception:
        pass
    from ..search.align import align_all
    return align_all


class DistributedPrefilter:
    """Ungapped prefilter over a host-sharded target DB: identical gating
    and ordering to search.ungapped.UngappedPrefilter, with the scan
    running on every chip of every host and one all_gather merge."""

    def __init__(self, tdb, mesh=None):
        import jax
        from .mesh import make_mesh
        self.tdb = tdb
        self.mesh = mesh if mesh is not None else make_mesh()
        self.st = shard_targets_per_host(tdb, self.mesh)

    def query_batch(self, seqs, params) -> List[List[tuple]]:
        from ..ops.gapless_pallas import pack_profile
        from ..search.ungapped import (BYTE_CAP, LQ_FAMILY, MIN_DIAG_SCORE,
                                       make_profile_stacks,
                                       make_query_profile)
        from .mesh import sharded_gapless_long, sharded_gapless_topk

        profs, biases = [], []
        for q_ss in seqs:
            p, b = make_query_profile(q_ss)
            profs.append(p)
            biases.append(b)
        # queries taller than the stacked kernel's VMEM family go through
        # the row-block-chained long kernel per shard (same split as the
        # single-host UngappedPrefilter)
        normal = [i for i, p in enumerate(profs)
                  if p.shape[1] + 1 <= LQ_FAMILY[-1]]
        long_q = [i for i in range(len(profs)) if i not in set(normal)]
        stacks = make_profile_stacks([profs[i] for i in normal],
                                     [biases[i] for i in normal])
        stacks = [([normal[g] for g in grp], stack, caps, q, lq)
                  for grp, stack, caps, q, lq in stacks]

        k = min(params.max_seqs, self.st.keys.shape[0])
        out: List[List[tuple]] = [None] * len(seqs)
        pending = []
        for grp, stack, caps, q, lq_pad in stacks:
            res = sharded_gapless_topk(self.st, stack, caps, q, lq_pad, k)
            pending.append(("topk", grp, res))
        for g in long_q:
            res = sharded_gapless_long(
                self.st, pack_profile(profs[g]),
                float(BYTE_CAP - biases[g]))
            pending.append(("long", [g], res))
        for kind, grp, (s_dev, k_dev) in pending:
            s = np.asarray(s_dev).astype(np.int64)
            keys = np.asarray(k_dev)
            if kind == "long":
                s, keys = s[None, :], keys[None, :]
            for r, g in enumerate(grp):
                ok = (s[r] > MIN_DIAG_SCORE) & (keys[r] >= 0)
                sr, kr = s[r][ok], keys[r][ok]
                order = np.lexsort((kr, -sr))[: params.max_seqs]
                out[g] = [(int(kr[i]), int(sr[i])) for i in order]
        return out
