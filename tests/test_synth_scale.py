"""Synthetic scale-DB machinery (db/synth.py) — the generator behind the
BASELINE config-5 bench (bench.py bench_scale). CI-sized here: 2k targets
through the full search pipeline on the CPU backend."""
import os

import numpy as np
import pytest

from foldseek_tpu.db.synth import synth_db
from foldseek_tpu.ingest.createdb import create_db
from foldseek_tpu.search.params import SearchParams
from foldseek_tpu.search.pipeline import search

EXAMPLE = "/root/reference/example"


@pytest.fixture(scope="module")
def base_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("synthbase")
    files = [os.path.join(EXAMPLE, f) for f in sorted(os.listdir(EXAMPLE))
             if "tim" not in f][:8]
    return create_db(files, str(d / "base"))


def test_synth_db_shape_and_content(base_db, tmp_path):
    db = synth_db(base_db, 500, str(tmp_path / "s500"), seed=4)
    assert db.size == 500
    lens = db.lengths()
    assert lens.min() >= 30 or lens.min() >= base_db.lengths().min()
    assert (np.asarray(db.keys) == np.arange(500)).all()
    # entries derive from real domains: 3Di alphabet range
    assert db.ss.min() >= 0 and db.ss.max() < 20
    assert db.ca is not None and len(db.ca) == db.total_residues


def test_search_on_synth_2k(base_db, tmp_path):
    tdb = synth_db(base_db, 2000, str(tmp_path / "t2k"), seed=5)
    qdb = synth_db(base_db, 4, str(tmp_path / "q4"), seed=6)
    params = SearchParams(prefilter_mode=1, add_backtrace=True, max_seqs=100)
    res = search(qdb, tdb, params, same_db=False)
    # every query is a perturbed crop of a real domain that also seeded
    # many targets: hits must exist and carry sane records
    n_hits = sum(len(v) for v in res.values())
    assert n_hits > 0
    for rs in res.values():
        for r in rs:
            assert 0 <= r.db_key < 2000
            assert r.evalue <= params.evalue_thr or r.seq_id == 1.0
            assert r.backtrace


def test_kmer_index_build_ram_bounded(base_db, tmp_path):
    """The vectorized posting-index builder keeps transients O(chunk), not
    O(DB): at 20k entries (~2.5M residues) the build must stay well under
    a 1.5 GB RSS delta (the round-2 per-sequence dict builder would churn
    far past this at scale; reference analogue:
    Prefiltering.cpp:289-381 memory-based split planning)."""
    import resource

    from foldseek_tpu.search.kmer import KmerPrefilter
    db = synth_db(base_db, 20_000, str(tmp_path / "t20k"), seed=9)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    pref = KmerPrefilter(db, SearchParams())
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    assert len(pref.post_ids) > 1000
    assert rss1 - rss0 < 1500.0, f"index build RSS delta {rss1 - rss0:.0f} MB"
    # and it answers queries
    import numpy as np
    hits = pref.query(np.asarray(db.get_ss(0)), 50, identity_id=0)
    assert hits and hits[0][0] == 0
