"""createindex round-trip + resident index server protocol."""
import shutil
import threading

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scop_db(example_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("idx")
    from foldseek_tpu.ingest.createdb import create_db
    files = [str(f) for f in sorted(example_dir.iterdir()) if "tim" not in f.name][:8]
    return create_db(files, str(d / "db"))


def test_createindex_same_results(scop_db):
    from foldseek_tpu.db.index import create_index, load_index
    from foldseek_tpu.search.kmer import kmer_prefilter
    from foldseek_tpu.search.params import SearchParams
    params = SearchParams()
    before = kmer_prefilter(scop_db, scop_db, params)
    create_index(scop_db)
    assert load_index(scop_db) is not None
    after = kmer_prefilter(scop_db, scop_db, params)
    assert before == after


def test_index_server_roundtrip(scop_db, tmp_path):
    from foldseek_tpu import server as srv
    sock = str(tmp_path / "idx.sock")
    t = threading.Thread(target=srv.serve, args=(scop_db.path, sock),
                         daemon=True)
    t.start()
    import time
    for _ in range(600):
        try:
            client = srv.IndexServerClient(sock)
            break
        except OSError:
            time.sleep(0.2)
    else:
        pytest.fail("server did not come up")
    assert client.ping()["n_targets"] == scop_db.size
    hits = client.query(np.asarray(scop_db.get_ss(0)))
    assert hits and hits[0][0] == int(scop_db.keys[0])  # self hit on top
    # parity with the in-process prefilter
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.ungapped import UngappedPrefilter
    pref = UngappedPrefilter(scop_db)
    local = pref.query(np.asarray(scop_db.get_ss(0)), SearchParams())
    assert hits == local
    # batched round trip == per-query results
    seqs = [np.asarray(scop_db.get_ss(i)) for i in range(scop_db.size)]
    batch = client.query_batch(seqs)
    assert batch == pref.query_batch(seqs, SearchParams())
    client.shutdown()
    t.join(timeout=30)
