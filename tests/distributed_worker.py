"""Worker for the 2-process x 4-device CPU distributed prefilter test.

Usage: python distributed_worker.py <port> <num_procs> <proc_id> <db> <out>

Each process forms the global 8-device mesh via jax.distributed (Gloo CPU
collectives), loads ONLY its host's panel rows, scans, merges with
all_gather, and writes its (replicated) result as JSON.
"""
import json
import os
import sys


def main():
    port, nprocs, pid, db_path, out_path = sys.argv[1:6]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=int(nprocs),
                               process_id=int(pid),
                               local_device_ids=list(range(4)))
    import numpy as np

    from foldseek_tpu.db.storage import load_db
    from foldseek_tpu.parallel.distributed import DistributedPrefilter
    from foldseek_tpu.search.params import SearchParams

    db = load_db(db_path)
    mode = sys.argv[6] if len(sys.argv) > 6 else "prefilter"
    if mode == "cluster":
        # easy-cluster with the align stages query-sharded over processes
        from foldseek_tpu.cluster.workflow import ClusterParams, cluster_db
        clusters = cluster_db(db, ClusterParams())
        with open(out_path, "w") as f:
            json.dump(sorted((int(k), sorted(int(m) for m in v))
                             for k, v in clusters.items()), f)
        return
    if mode == "multimer":
        from foldseek_tpu.multimer.workflow import multimer_search
        res = multimer_search(db, db, SearchParams())
        lines = [f"{qk}\t{line}" for qk in sorted(res) for line in res[qk]]
        with open(out_path, "w") as f:
            json.dump(lines, f)
        return
    if mode == "search":
        from foldseek_tpu.parallel.distributed import distributed_search
        from foldseek_tpu.search.results import result_to_line
        res = distributed_search(
            db, db, SearchParams(add_backtrace=True, prefilter_mode=1,
                                 max_seqs=16))
        lines = [f"{qk}\t{result_to_line(r, True)}"
                 for qk in sorted(res) for r in res[qk]]
        with open(out_path, "w") as f:
            json.dump(lines, f)
        return
    pref = DistributedPrefilter(db)
    seqs = [np.asarray(db.get_ss(i)) for i in range(min(db.size, 8))]
    hits = pref.query_batch(seqs, SearchParams())
    with open(out_path, "w") as f:
        json.dump(hits, f)


if __name__ == "__main__":
    main()
