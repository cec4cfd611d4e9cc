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
