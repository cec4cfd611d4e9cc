"""k-mer prefilter parity vs the reference `prefilter` module fixture."""
import json

import numpy as np
import pytest

from foldseek_tpu.ingest.createdb import create_db
from foldseek_tpu.search.kmer import KmerPrefilter
from foldseek_tpu.search.params import SearchParams


@pytest.fixture(scope="module")
def exdb(example_dir, tmp_path_factory):
    return create_db([str(example_dir)], str(tmp_path_factory.mktemp("db") / "exdb"))


def test_kmer_prefilter_parity(exdb, golden_dir):
    """Fixture generated with: prefilter exdb_ss exdb_ss out --threads 1 -s 9.5
    (standalone defaults: bias scale 1.0, max-res 300, k auto->6)."""
    with open(golden_dir / "kpref.json") as f:
        golden = json.load(f)
    pref = KmerPrefilter(exdb, SearchParams(sensitivity=9.5), bias_scale=1.0)
    name_by_idx = {i: exdb.names[i] for i in range(exdb.size)}
    for qi in range(exdb.size):
        hits = pref.query(np.asarray(exdb.get_ss(qi)), 300, identity_id=qi)
        mine = [[name_by_idx[t], s, d if d < 32768 else d - 65536]
                for t, s, d in hits]
        assert mine == golden[exdb.names[qi]], exdb.names[qi]


def test_kmer_prefilter_parity_k7(exdb, golden_dir):
    """k=7 path (the reference's big-DB auto choice and its documented
    threshold model thr = 197.0 - 11.22*s, FoldseekBase.cpp:444).
    Fixture: prefilter exdb_ss exdb_ss pref7 --threads 1 -s 9.5 -k 7."""
    with open(golden_dir / "kpref7.json") as f:
        golden = json.load(f)
    pref = KmerPrefilter(exdb, SearchParams(sensitivity=9.5), k=7,
                         bias_scale=1.0)
    name_by_idx = {i: exdb.names[i] for i in range(exdb.size)}
    for qi in range(exdb.size):
        hits = pref.query(np.asarray(exdb.get_ss(qi)), 300, identity_id=qi)
        mine = [[name_by_idx[t], s, d if d < 32768 else d - 65536]
                for t, s, d in hits]
        assert mine == golden[exdb.names[qi]], exdb.names[qi]


def test_auto_k_rule(exdb):
    """IndexTable::computeKmerSize: k=6 under 3.35e9 residues, k=7 above."""
    assert KmerPrefilter(exdb, SearchParams()).k == 6
    from foldseek_tpu.search.kmer import KmerPrefilter as KP
    class Fake:
        pass
    # don't build an index for the threshold check — only the k choice
    import foldseek_tpu.search.kmer as km
    orig = KP._build_index
    KP._build_index = lambda self: None
    try:
        fake = Fake()
        fake.total_residues = 4_000_000_000
        fake.size = 1000
        assert KP(fake, SearchParams()).k == 7
    finally:
        KP._build_index = orig


def test_target_split_matches_unsplit(exdb, monkeypatch):
    """Memory-based TARGET_DB_SPLIT (Prefiltering.cpp:289-381): forcing a
    tiny RAM budget splits the posting index over target ranges; the
    merged per-query candidates must equal the unsplit run (max_seqs
    large enough that per-split adaptive thresholds don't bind)."""
    from foldseek_tpu.search.kmer import kmer_prefilter, plan_kmer_splits
    params = SearchParams(max_seqs=1000)
    unsplit = kmer_prefilter(exdb, exdb, params)
    monkeypatch.setenv("FOLDSEEK_TPU_KMER_RAM_MB", "1")
    splits = plan_kmer_splits(exdb, 1 << 20)
    assert len(splits) == 1  # tiny DB still fits 1 MB? compute honestly
    # force real splitting regardless of DB size
    monkeypatch.setattr("foldseek_tpu.search.kmer.plan_kmer_splits",
                        lambda tdb, budget: [(0, 10), (10, 20),
                                             (20, tdb.size)])
    split = kmer_prefilter(exdb, exdb, params)
    assert split == unsplit


def test_query_pssm_profile_mode(example_dir, tmp_path):
    """Profile (PSSM) k-mer prefilter smoke: profile-mode thresholds +
    index, single-position k-mer generation with rankedDescSort20 tie
    order; the query's own profile must rank its source structure first."""
    import numpy as np

    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.kmer import (KmerPrefilter,
                                          kmer_threshold_profile)
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import search
    from foldseek_tpu.search.profile import pssm_store_bytes, result2profile

    assert kmer_threshold_profile(6, 9.5) == 75  # no-ctx branch (ref-verified)
    assert kmer_threshold_profile(6, 9.5, context_pseudo_counts=True) == 49
    files = [str(example_dir / f) for f in
             ("d1asha_", "d1mbaa_", "d1or4a_", "d1naza_")]
    db = create_db(files, str(tmp_path / "db"))
    results = search(db, db, SearchParams(evalue_thr=0.001,
                                          add_backtrace=True))
    profs = result2profile(db, db, results)
    kp = KmerPrefilter(db, SearchParams(), bias_scale=0.15,
                       profile_mode=True)
    assert kp.index_thr == 0 and kp.kmer_thr == 75
    from foldseek_tpu.ops.matrices import mat3di
    m3 = mat3di()
    for qi in range(db.size):
        entry = profs[int(db.keys[qi])]
        pssm = pssm_store_bytes(entry.prob_ss, m3.p_back)
        letters = np.asarray(db.get_ss(qi), dtype=np.int64)
        hits = kp.query_pssm(pssm, letters, 1000, identity_id=qi)
        assert hits and hits[0][0] == qi  # identity leads
        # the self target must rescore far above unrelated ones
        scores = {t: s for t, s, _ in hits}
        assert scores[qi] == 65535 or scores[qi] >= max(
            v for t, v in scores.items() if t != qi)
