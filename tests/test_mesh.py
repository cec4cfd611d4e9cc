"""Multi-device sharding: the sharded prefilter must reproduce the
single-device UngappedPrefilter exactly (conftest provides an 8-virtual-
device CPU mesh — the same mechanism the driver's dryrun_multichip uses)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh8():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from foldseek_tpu.parallel.mesh import make_mesh
    return make_mesh(8)


@pytest.fixture(scope="module")
def scop_db(example_dir, tmp_path_factory):
    from foldseek_tpu.ingest.createdb import create_db
    d = tmp_path_factory.mktemp("mesh")
    files = [str(f) for f in sorted(example_dir.iterdir()) if "tim" not in f.name]
    return create_db(files, str(d / "db"))


def test_sharded_topk_matches_unsharded_prefilter(scop_db, mesh8):
    """Global top-k over the 8-way sharded panel == the single-device
    production prefilter (same profiles, same byte cap, same gating)."""
    from foldseek_tpu.parallel.distributed import DistributedPrefilter
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.ungapped import UngappedPrefilter

    params = SearchParams()
    single = UngappedPrefilter(scop_db)
    dist = DistributedPrefilter(scop_db, mesh=mesh8)
    seqs = [np.asarray(scop_db.get_ss(i)) for i in range(scop_db.size)]
    a = single.query_batch(seqs, params)
    b = dist.query_batch(seqs, params)
    assert a == b


def test_host_row_range_partition(scop_db, mesh8):
    """Every panel row is owned by exactly one process slice."""
    from foldseek_tpu.parallel.distributed import host_row_range
    n_pad = 1024
    r0, r1 = host_row_range(n_pad, mesh8)
    assert (r0, r1) == (0, n_pad)  # single process owns all rows
