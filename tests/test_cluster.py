"""Clustering: clust algorithm unit tests + easy-cluster golden parity."""
import shutil

import numpy as np
import pytest

from foldseek_tpu.cluster.clust import (AlnEdge, MODE_CONNECTED_COMPONENT,
                                        MODE_GREEDY_MEM, MODE_SET_COVER,
                                        cluster, length_sort_order,
                                        pairs_to_clusters)


def test_length_sort_order():
    keys = np.array([3, 1, 2])
    lens = np.array([10, 10, 30])
    # length desc, ties by key-sorted position (key asc)
    order = length_sort_order(keys, lens)
    assert [int(keys[i]) for i in order] == [2, 1, 3]


def test_set_cover_basic():
    # 0-1-2 clique + singleton 3; node 1 has most edges -> rep
    keys = [0, 1, 2, 3]
    lens = [100, 90, 80, 70]
    edges = {
        0: [AlnEdge(0, 1000), AlnEdge(1, 500)],
        1: [AlnEdge(1, 1000), AlnEdge(0, 500), AlnEdge(2, 400)],
        2: [AlnEdge(2, 1000), AlnEdge(1, 400)],
        3: [AlnEdge(3, 1000)],
    }
    pairs = cluster(keys, lens, edges, MODE_SET_COVER)
    clusters = pairs_to_clusters(pairs)
    assert set(clusters[1]) == {0, 1, 2}
    assert clusters[3] == [3]


def test_connected_component_transitive():
    keys = [0, 1, 2]
    lens = [10, 20, 30]
    edges = {
        0: [AlnEdge(0, 1000), AlnEdge(1, 100)],
        1: [AlnEdge(1, 1000), AlnEdge(2, 100)],
        2: [AlnEdge(2, 1000)],
    }
    pairs = cluster(keys, lens, edges, MODE_CONNECTED_COMPONENT)
    clusters = pairs_to_clusters(pairs)
    assert len(clusters) == 1


def test_greedy_incremental():
    keys = [0, 1, 2]
    lens = [30, 20, 10]  # 0 longest -> claims 1; 2 separate
    edges = {
        0: [AlnEdge(0, 0), AlnEdge(1, 0)],
        1: [AlnEdge(1, 0), AlnEdge(0, 0)],
        2: [AlnEdge(2, 0)],
    }
    pairs = cluster(keys, lens, edges, MODE_GREEDY_MEM)
    clusters = pairs_to_clusters(pairs)
    assert set(clusters[0]) == {0, 1}
    assert clusters[2] == [2]


def test_kmermatcher_groups_identical_seqs(example_dir, tmp_path):
    from foldseek_tpu.cluster.kmermatcher import KmerMatcherParams, kmermatcher
    from foldseek_tpu.ingest.createdb import create_db
    d = tmp_path / "db"
    create_db([str(example_dir / "d1asha_"), str(example_dir / "d1b0ba_")],
              str(d))
    from foldseek_tpu.db.storage import load_db
    db = load_db(str(d))
    res = kmermatcher(db, KmerMatcherParams(kmers_per_sequence=300,
                                            spaced_kmer=True))
    # every key appears exactly once as an entry
    assert set(res.keys()) == {int(k) for k in db.keys}
    for key, lines in res.items():
        assert lines[0] == (key, 0, 0)


@pytest.fixture(scope="module")
def scop_dir(example_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("scop_clu")
    for f in example_dir.iterdir():
        if "tim" not in f.name:
            shutil.copy(f, d / f.name)
    return d


def test_easy_cluster_scop_golden(scop_dir, golden_dir, tmp_path):
    """Cluster assignments on the 26 SCOP domains match the reference's
    easy-cluster golden output (as rep -> member-set equality)."""
    from foldseek_tpu.cli import main
    prefix = str(tmp_path / "clu")
    rc = main(["easy-cluster", str(scop_dir), prefix, str(tmp_path / "tmp"),
               "-v", "1"])
    assert rc == 0

    def read_clusters(path):
        clusters = {}
        for line in open(path):
            rep, member = line.rstrip("\n").split("\t")
            clusters.setdefault(rep, set()).add(member)
        return clusters

    mine = read_clusters(prefix + "_cluster.tsv")
    golden = read_clusters(golden_dir / "scop_clu_cluster.tsv")
    assert mine == golden


def test_clusterupdate_flow(example_dir, tmp_path):
    """clusterupdate: removed entries drop out, surviving clusters keep
    their reps, added entries join an existing cluster (or form new
    ones) without re-clustering the kept set (ClusterUpdate workflow)."""
    from foldseek_tpu.cli import main
    from foldseek_tpu.db.storage import load_db
    files = [str(example_dir / n) for n in
             ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    old = str(tmp_path / "old")
    assert main(["createdb"] + files + [old, "-v", "1"]) == 0
    oldclu = str(tmp_path / "old.tsv")
    # cluster the old DB directly (search + clust)
    aln = str(tmp_path / "aln")
    assert main(["search", old, old, aln, str(tmp_path / "t1"),
                 "--exhaustive-search", "1", "-v", "1"]) == 0
    assert main(["clust", old, aln, oldclu, "-v", "1"]) == 0
    # new DB: drop d1or4a_, keep the rest (header-identical)
    newfiles = [f for f in files if "d1or4a_" not in f]
    new = str(tmp_path / "new")
    assert main(["createdb"] + newfiles + [new, "-v", "1"]) == 0
    newclu = str(tmp_path / "new.tsv")
    assert main(["clusterupdate", old, new, oldclu, newclu,
                 str(tmp_path / "utmp"), "-v", "1"]) == 0
    rows = [l.split("\t") for l in open(newclu).read().splitlines()]
    members = {m for _, m in rows}
    newdb = load_db(new)
    assert members == set(newdb.names)          # everyone placed once
    assert len(rows) == len(members)            # no duplicates
    assert "d1or4a_" not in members             # removed entry gone


def test_clusterupdate_new_entries(example_dir, tmp_path):
    """Added sequences: a structurally-unrelated new entry forms its own
    cluster; surviving clusters keep their membership."""
    from foldseek_tpu.cli import main
    files = [str(example_dir / n) for n in ("d1asha_", "d1mbaa_", "d1itha_")]
    old = str(tmp_path / "old")
    assert main(["createdb"] + files + [old, "-v", "1"]) == 0
    aln = str(tmp_path / "aln")
    assert main(["search", old, old, aln, str(tmp_path / "t1"),
                 "--exhaustive-search", "1", "-v", "1"]) == 0
    oldclu = str(tmp_path / "old.tsv")
    assert main(["clust", old, aln, oldclu, "-v", "1"]) == 0
    new = str(tmp_path / "new")
    assert main(["createdb"] + files + [str(example_dir / "1tim.pdb.gz"),
                 new, "-v", "1"]) == 0
    newclu = str(tmp_path / "new.tsv")
    assert main(["clusterupdate", old, new, oldclu, newclu,
                 str(tmp_path / "utmp"), "-v", "1"]) == 0
    rows = set(map(tuple, (l.split("\t") for l in
                           open(newclu).read().splitlines())))
    old_rows = set(map(tuple, (l.split("\t") for l in
                               open(oldclu).read().splitlines())))
    assert old_rows <= rows                    # kept clusters unchanged
    # the unrelated TIM chains do not join a globin cluster
    tim_rows = {(r, m) for r, m in rows if m.startswith("1tim")}
    assert tim_rows and all(r.startswith("1tim") for r, _ in tim_rows)
