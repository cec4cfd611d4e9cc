"""Multi-device sharding: sharded prefilter top-k must equal the
single-device result (conftest provides an 8-virtual-device CPU mesh —
the same mechanism the driver's dryrun_multichip uses)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh8():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from foldseek_tpu.parallel.mesh import make_mesh
    return make_mesh(8)


def test_sharded_topk_matches_single_device(example_dir, tmp_path_factory, mesh8):
    import jax.numpy as jnp

    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.ops.gapless import combine_profiles, gapless_scores
    from foldseek_tpu.ops.sw import QueryProfile
    from foldseek_tpu.parallel.mesh import shard_targets, sharded_gapless_topk
    d = tmp_path_factory.mktemp("mesh")
    files = [str(f) for f in sorted(example_dir.iterdir()) if "tim" not in f.name]
    db = create_db(files, str(d / "db"))
    st = shard_targets(db, mesh8, lt_pad=256)
    qp = QueryProfile(np.asarray(db.get_aa(0)), np.asarray(db.get_ss(0)))
    pa, ps = qp.padded(256)
    prof = combine_profiles(pa, ps)
    k = 3  # <= entries per shard (24 entries / 8 devices)
    s_sh, k_sh = (np.asarray(x) for x in
                  sharded_gapless_topk(st, jnp.asarray(prof), k=k, chunk=32))

    # single-device reference over the same padded panels
    lens = db.lengths()
    n = db.size
    t_aa = np.full((n, 256), 20, dtype=np.int8)
    t_ss = np.full((n, 256), 20, dtype=np.int8)
    for i in range(n):
        L = min(int(lens[i]), 256)
        t_aa[i, :L] = db.get_aa(i)[:L]
        t_ss[i, :L] = db.get_ss(i)[:L]
    ref, _, _ = gapless_scores(jnp.asarray(prof), jnp.asarray(t_aa),
                               jnp.asarray(t_ss),
                               jnp.asarray(np.minimum(lens, 256).astype(np.int32)),
                               chunk=32)
    ref = np.asarray(ref)
    order = np.argsort(-ref, kind="stable")[:k]
    # top-k score multiset must match exactly...
    assert np.allclose(sorted(s_sh, reverse=True), sorted(ref[order], reverse=True))
    # ...and every returned key must carry its own reference score (handles
    # ties at the k boundary without being vacuous)
    key_to_score = {int(db.keys[i]): float(ref[i]) for i in range(n)}
    for kk, ss in zip(k_sh, s_sh):
        assert np.isclose(key_to_score[int(kk)], float(ss)), (kk, ss)
