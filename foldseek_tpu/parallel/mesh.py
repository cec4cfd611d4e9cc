"""Multi-chip scale-out: sharded target DB + replicated queries.

The reference distributes with MPI: target-DB splits assigned round-robin to
ranks, each rank computes its split, the master merges hit lists through the
shared filesystem (reference: lib/mmseqs/src/prefiltering/Prefiltering.cpp:
589-700 runMpiSplits, MMseqsMPI.cpp). TPU-native replacement: the padded
int8 target arrays live sharded across devices over a 1-D `db` mesh axis,
queries are replicated, each device scores its shard and selects a local
top-k, and the global top-k is merged with an all_gather over ICI — no
filesystem round-trip, no master rank.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..db.storage import StructDB

DB_AXIS = "db"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DB_AXIS,))


@dataclass
class ShardedTargets:
    """Transposed 3Di target panel [Lt_pad, n_pad] sharded over the db axis
    (the production gapless kernel's layout; target rows ride the lane
    axis, so the shard boundary is the lane/batch dimension)."""
    mesh: Mesh
    ss_T: jax.Array      # int32 [Lt_pad, n_pad] sharded P(None, 'db')
    keys: jax.Array      # int64 [n_pad] sharded P('db')  (-1 for pad rows)
    n_total: int
    lt_pad: int


def shard_targets(tdb: StructDB, mesh: Mesh, lt_pad: Optional[int] = None,
                  max_entries: Optional[int] = None) -> ShardedTargets:
    n_dev = mesh.devices.size
    n = tdb.size if max_entries is None else min(tdb.size, max_entries)
    lens = tdb.lengths()[:n]
    if lt_pad is None:
        lt_pad = int(-(-int(lens.max()) // 128) * 128)
    # per-device row count must be a kernel block multiple (128)
    per_dev = -(-n // n_dev)
    per_dev = -(-per_dev // 128) * 128
    n_pad = per_dev * n_dev
    from ..db.panels import PAD_LETTER
    ss = np.full((n_pad, lt_pad), PAD_LETTER, dtype=np.int32)
    keys = np.full(n_pad, -1, dtype=np.int64)
    for i in range(n):
        L = min(int(lens[i]), lt_pad)
        ss[i, :L] = tdb.get_ss(i)[:L]
        keys[i] = int(tdb.keys[i])
    shard = NamedSharding(mesh, P(None, DB_AXIS))
    shard1 = NamedSharding(mesh, P(DB_AXIS))
    return ShardedTargets(
        mesh=mesh,
        ss_T=jax.device_put(np.ascontiguousarray(ss.T), shard),
        keys=jax.device_put(keys, shard1),
        n_total=n, lt_pad=lt_pad)


DP_AXIS = "dp"
TP_AXIS = "tp"


def make_model_mesh(n_devices: Optional[int] = None, tp: int = 2) -> Mesh:
    """2-D (dp, tp) mesh for ProstT5 inference: batch over dp, attention
    heads + FFN over tp."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    while tp > 1 and n % tp:
        tp -= 1
    return Mesh(np.array(devs).reshape(n // tp, tp), (DP_AXIS, TP_AXIS))


def prostt5_shardings(mesh: Mesh, params):
    """NamedShardings for the ProstT5 param tree: column-parallel qkv/up,
    row-parallel o/down (Megatron layout), everything else replicated.
    XLA inserts the psum over `tp` at the row-parallel matmuls."""
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, TP_AXIS))
    row = NamedSharding(mesh, P(TP_AXIS, None))

    out = {k: rep for k in params if k != "layers"}
    out["layers"] = [
        {"attn_norm": rep, "wq": col, "wk": col, "wv": col, "wo": row,
         "ffn_norm": rep, "ffn_up": col, "ffn_down": row}
        for _ in params["layers"]]
    return out


def prostt5_sharded_forward(mesh: Mesh, cfg, params, tokens, mask):
    """jit the ProstT5 encoder over the (dp, tp) mesh: batch data-parallel,
    params tensor-parallel per prostt5_shardings."""
    from ..nn.prostt5 import encoder_forward

    shardings = prostt5_shardings(mesh, params)
    params = jax.tree.map(lambda x, s: jax.device_put(jnp.asarray(x), s),
                          params, shardings,
                          is_leaf=lambda x: isinstance(x, (np.ndarray, jnp.ndarray)))
    batch_shard = NamedSharding(mesh, P(DP_AXIS, None))
    tokens = jax.device_put(jnp.asarray(tokens), batch_shard)
    mask = jax.device_put(jnp.asarray(mask), batch_shard)

    @functools.partial(jax.jit, static_argnums=())
    def f(params, tokens, mask):
        return encoder_forward(params, cfg, tokens, mask)

    return f(params, tokens, mask)


def sharded_gapless_long(st: ShardedTargets, prof_packed: np.ndarray,
                         cap: float):
    """Gapless scores of ONE long query (> the stacked kernel's VMEM
    family) against the full sharded DB: per device the row-block-chained
    long kernel (ops/gapless_pallas.gapless_scores_long) over the local
    panel shard, then an all_gather of the per-shard score vectors.
    Returns (scores [n_pad], keys [n_pad]) replicated — the multi-host
    long-query path that lifts DistributedPrefilter's former length cap."""
    from ..ops.gapless_pallas import gapless_scores_long

    mesh = st.mesh

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None, DB_AXIS), P(DB_AXIS)),
        out_specs=(P(None), P(None)),
        check_vma=False,  # all_gather replicates; vma can't prove it
    )
    def run(prof, ss_T, keys):
        scores = gapless_scores_long(prof, ss_T, cap)
        scores = jnp.where(keys >= 0, scores, -1.0)
        all_s = jax.lax.all_gather(scores, DB_AXIS, axis=0).reshape(-1)
        all_k = jax.lax.all_gather(keys, DB_AXIS, axis=0).reshape(-1)
        return all_s, all_k

    return run(jnp.asarray(prof_packed), st.ss_T, st.keys)


def sharded_gapless_topk(st: ShardedTargets, prof_stack: jax.Array,
                         caps: jax.Array, q: int, lq_pad: int, k: int):
    """Score a stacked query batch against the full sharded DB; return the
    global per-query top-k.

    Per device: the production Pallas gapless kernel over the local panel
    shard + local top-k; merge: all_gather of [q, k] candidates over
    ICI/DCN, then global top-k. Returns (scores [q, k], keys [q, k])
    replicated on all devices. Inputs come from
    ops.gapless_pallas.pack_profiles_batch; this is exactly the single-chip
    prefilter math (byte cap included), so the merged result equals an
    unsharded UngappedPrefilter scan.

    Tie order: top_k breaks equal scores by local panel row, which matches
    the host lexsort((key, -score)) order only when DB keys ascend with
    panel row order (true for createdb/makepadded output; callers feeding
    reordered subdbs should re-sort candidates on the host)."""
    from ..ops.gapless_pallas import gapless_scores_batch

    mesh = st.mesh
    n_dev = mesh.devices.size
    k_local = min(k, st.keys.shape[0] // n_dev)
    k = min(k, k_local * n_dev)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(None, DB_AXIS), P(DB_AXIS)),
        out_specs=(P(None, None), P(None, None)),
        # all_gather + top_k makes the outputs bitwise-replicated, but the vma
        # type system cannot prove it
        check_vma=False,
    )
    def run(prof_stack, caps, ss_T, keys):
        scores = gapless_scores_batch(prof_stack, ss_T, caps, q, lq_pad)
        scores = jnp.where(keys[None, :] >= 0, scores, -1.0)
        local_s, local_i = jax.lax.top_k(scores, k_local)    # [q, k_local]
        local_keys = keys[local_i]
        all_s = jax.lax.all_gather(local_s, DB_AXIS, axis=1).reshape(q, -1)
        all_keys = jax.lax.all_gather(local_keys, DB_AXIS, axis=1).reshape(q, -1)
        best_s, best_i = jax.lax.top_k(all_s, k)
        return best_s, jnp.take_along_axis(all_keys, best_i, axis=1)

    return run(prof_stack, caps, st.ss_T, st.keys)
