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
    """Target DB padded to [n_pad, Lt_pad] and sharded over the db axis."""
    mesh: Mesh
    aa: jax.Array        # int8 [n_pad, Lt_pad] sharded P('db', None)
    ss: jax.Array        # int8 [n_pad, Lt_pad]
    lens: jax.Array      # int32 [n_pad]
    keys: jax.Array      # int32 [n_pad]  (-1 for padding rows)
    n_total: int
    lt_pad: int


def shard_targets(tdb: StructDB, mesh: Mesh, lt_pad: Optional[int] = None,
                  max_entries: Optional[int] = None) -> ShardedTargets:
    n_dev = mesh.devices.size
    n = tdb.size if max_entries is None else min(tdb.size, max_entries)
    lens = tdb.lengths()[:n]
    if lt_pad is None:
        lt_pad = int(-(-int(lens.max()) // 128) * 128)
    n_pad = -(-n // n_dev) * n_dev
    aa = np.full((n_pad, lt_pad), 20, dtype=np.int8)
    ss = np.full((n_pad, lt_pad), 20, dtype=np.int8)
    lens_pad = np.zeros(n_pad, dtype=np.int32)
    keys = np.full(n_pad, -1, dtype=np.int32)
    for i in range(n):
        L = min(int(lens[i]), lt_pad)
        aa[i, :L] = tdb.get_aa(i)[:L]
        ss[i, :L] = tdb.get_ss(i)[:L]
        lens_pad[i] = L
        keys[i] = int(tdb.keys[i])
    shard = NamedSharding(mesh, P(DB_AXIS, None))
    shard1 = NamedSharding(mesh, P(DB_AXIS))
    return ShardedTargets(
        mesh=mesh,
        aa=jax.device_put(aa, shard),
        ss=jax.device_put(ss, shard),
        lens=jax.device_put(lens_pad, shard1),
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


def sharded_gapless_topk(st: ShardedTargets, prof: jax.Array, k: int,
                         chunk: int = 32):
    """Score one query against the full sharded DB; return global top-k.

    Per device: gapless kernel over the local shard + local top-k;
    merge: all_gather of [k] candidates over ICI, then global top-k.
    Returns (scores [k], keys [k]) replicated on all devices.
    """
    from ..ops.gapless import gapless_scores

    mesh = st.mesh

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(DB_AXIS, None), P(DB_AXIS, None),
                  P(DB_AXIS), P(DB_AXIS)),
        out_specs=(P(None), P(None)),
        # all_gather + top_k makes the outputs bitwise-replicated, but the vma
        # type system cannot prove it
        check_vma=False,
    )
    def run(prof, aa, ss, lens, keys):
        scores, _, _ = gapless_scores(prof, aa, ss, lens, chunk=chunk)
        scores = jnp.where(keys >= 0, scores, -1.0)
        local_s, local_i = jax.lax.top_k(scores, k)
        local_keys = keys[local_i]
        all_s = jax.lax.all_gather(local_s, DB_AXIS).reshape(-1)
        all_keys = jax.lax.all_gather(local_keys, DB_AXIS).reshape(-1)
        best_s, best_i = jax.lax.top_k(all_s, k)
        return best_s, all_keys[best_i]

    return run(prof, st.aa, st.ss, st.lens, st.keys)
