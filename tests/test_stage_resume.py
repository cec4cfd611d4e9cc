"""Stage-level resume (reference: data/structuresearch.sh:41-55 `notExists
"$OUT.dbtype"` guards + param-hashed tmp dirs, StructureSearch.cpp:82-87).

A re-invoked search with the same parameters must skip completed stages
(prefilter, align) and still produce identical output; changed parameters
must NOT reuse stale artifacts; a run killed mid-align must redo the align
stage but reuse the finished prefilter."""
import os
import signal
import subprocess
import sys

import pytest

from foldseek_tpu.db.storage import load_db
from foldseek_tpu.ingest.createdb import create_db
from foldseek_tpu.search.params import SearchParams
from foldseek_tpu.search.pipeline import search
from foldseek_tpu.search.stages import StageCache, param_hash

EXAMPLE = "/root/reference/example"
DOMAINS = ["d1asha_", "d1b0ba_", "d1cg5a_", "d1cg5b_"]


@pytest.fixture(scope="module")
def small_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_db")
    return create_db([os.path.join(EXAMPLE, n) for n in DOMAINS],
                     str(d / "db"))


def _fmt(results):
    return [(q, r.db_key, r.score, r.q_start, r.q_end, r.t_start, r.t_end,
             r.backtrace)
            for q in sorted(results) for r in results[q]]


def test_search_resumes_and_matches(small_db, tmp_path, caplog):
    params = SearchParams(add_backtrace=True)
    tmp = str(tmp_path / "tmp")
    os.makedirs(tmp)
    first = search(small_db, small_db, params, tmp_dir=tmp)
    # both stage artifacts + markers exist under the param-hash dir
    h = param_hash(params, small_db, small_db)
    stage_dir = os.path.join(tmp, h)
    for name in ("pref", "aln"):
        assert os.path.exists(os.path.join(stage_dir, name + ".done")), name
    assert os.path.islink(os.path.join(tmp, "latest"))

    import logging
    with caplog.at_level(logging.INFO, logger="foldseek_tpu"):
        second = search(small_db, small_db, params, tmp_dir=tmp)
    skips = [r for r in caplog.records if "resume: skipping" in r.getMessage()]
    assert len(skips) == 2  # pref + aln both skipped
    assert _fmt(second) == _fmt(first)


def test_changed_params_get_fresh_stage_dir(small_db, tmp_path):
    p1 = SearchParams(add_backtrace=True)
    p2 = SearchParams(add_backtrace=True, evalue_thr=0.001)
    assert param_hash(p1, small_db) != param_hash(p2, small_db)
    tmp = str(tmp_path / "tmp")
    os.makedirs(tmp)
    r1 = search(small_db, small_db, p1, tmp_dir=tmp)
    r2 = search(small_db, small_db, p2, tmp_dir=tmp)
    assert all(r.evalue <= 0.001 for rs in r2.values() for r in rs)
    assert len(os.listdir(tmp)) >= 3  # two hash dirs + latest


def test_incomplete_artifact_reruns(small_db, tmp_path):
    """An artifact without its .done marker (crash between write and mark)
    must be recomputed, not trusted."""
    params = SearchParams(add_backtrace=True)
    tmp = str(tmp_path / "tmp")
    os.makedirs(tmp)
    first = search(small_db, small_db, params, tmp_dir=tmp)
    h = param_hash(params, small_db, small_db)
    # simulate a crash that left a corrupt aln artifact and no marker
    aln = os.path.join(tmp, h, "aln")
    os.unlink(aln + ".done")
    with open(aln, "w") as f:
        f.write("#foldseek-tpu alnres v1 backtrace=1\n9999\tgarbage\n")
    second = search(small_db, small_db, params, tmp_dir=tmp)
    assert _fmt(second) == _fmt(first)


KILL_SCRIPT = r"""
import os, sys
sys.path.insert(0, "/root/repo")
import foldseek_tpu.search.align as align_mod

orig = align_mod.align_all
def dying_align_all(*a, **k):
    os.kill(os.getpid(), 9)  # hard kill mid-stage, like a preempted host
align_mod.align_all = dying_align_all
import foldseek_tpu.search.pipeline as pl
pl.align_all = dying_align_all

from foldseek_tpu.db.storage import load_db
from foldseek_tpu.search.params import SearchParams
db = load_db(sys.argv[1])
pl.search(db, db, SearchParams(add_backtrace=True), tmp_dir=sys.argv[2])
"""


def test_kill9_mid_align_resumes_from_prefilter(small_db, tmp_path):
    tmp = str(tmp_path / "tmp")
    os.makedirs(tmp)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", KILL_SCRIPT, small_db.path, tmp],
        env=env, capture_output=True, timeout=300)
    assert proc.returncode == -signal.SIGKILL
    params = SearchParams(add_backtrace=True)
    h = param_hash(params, small_db, small_db)
    stage_dir = os.path.join(tmp, h)
    assert os.path.exists(os.path.join(stage_dir, "pref.done"))
    assert not os.path.exists(os.path.join(stage_dir, "aln.done"))
    # resume completes and matches a from-scratch run
    resumed = search(small_db, small_db, params, tmp_dir=tmp)
    fresh = search(small_db, small_db, params)
    assert _fmt(resumed) == _fmt(fresh)


def test_cluster_resume_matches(small_db, tmp_path, caplog):
    from foldseek_tpu.cluster.workflow import ClusterParams, cluster_db
    params = ClusterParams()
    tmp = str(tmp_path / "ctmp")
    os.makedirs(tmp)
    first = cluster_db(small_db, params, tmp_dir=tmp)
    import logging
    with caplog.at_level(logging.INFO, logger="foldseek_tpu"):
        second = cluster_db(small_db, params, tmp_dir=tmp)
    skips = [r for r in caplog.records if "resume: skipping" in r.getMessage()]
    assert skips  # at least the clustering steps were skipped
    assert second == first


def test_resume_keeps_backtraces_without_add_backtrace(small_db, tmp_path):
    """Stage artifacts persist backtraces even when add_backtrace=False:
    a resumed iterative search feeds result2profile the same records a
    fresh run would (the round-3 review's silent-PSSM-gutting case)."""
    params = SearchParams(add_backtrace=False)
    tmp = str(tmp_path / "tmp")
    os.makedirs(tmp)
    first = search(small_db, small_db, params, tmp_dir=tmp)
    assert all(r.backtrace for rs in first.values() for r in rs)
    # resumed records carry the same backtraces
    second = search(small_db, small_db, params, tmp_dir=tmp)
    assert _fmt(second) == _fmt(first)


def test_rebuilt_db_invalidates_stage_cache(small_db, tmp_path):
    """The stage hash keys on DB CONTENT (r3 VERDICT weak #5): a rebuild
    that changes the 3Di payload must change the hash even when shape,
    path, mtime, and size are all identical; a byte-identical copy with a
    different mtime must NOT (a pure re-stat is resumable)."""
    import shutil
    params = SearchParams()
    copy_path = str(tmp_path / "dbcopy")
    shutil.copytree(small_db.path, copy_path)
    db1 = load_db(copy_path)
    h1 = param_hash(params, db1, db1)

    # mtime-only change, identical bytes: hash must be stable
    m = os.path.join(copy_path, "manifest.json")
    os.utime(m, ns=(os.stat(m).st_mtime_ns + 10**9,
                    os.stat(m).st_mtime_ns + 10**9))
    db2 = load_db(copy_path)
    assert param_hash(params, db2, db2) == h1

    # same-shape payload change (one 3Di letter flipped in place): the
    # mtime/size keying this test used to pin would MISS this case
    ss_path = os.path.join(copy_path, "ss.npy")
    st = os.stat(ss_path)
    with open(ss_path, "r+b") as f:
        f.seek(-1, os.SEEK_END)
        old = f.read(1)
        f.seek(-1, os.SEEK_END)
        f.write(bytes([(old[0] + 1) % 20]))
    os.utime(ss_path, ns=(st.st_mtime_ns, st.st_mtime_ns))
    db3 = load_db(copy_path)
    assert param_hash(params, db3, db3) != h1


def test_multimersearch_resumes(small_db, tmp_path, caplog):
    from foldseek_tpu.multimer.workflow import multimer_search
    params = SearchParams()
    tmp = str(tmp_path / "mtmp")
    os.makedirs(tmp)
    first = multimer_search(small_db, small_db, params, tmp_dir=tmp)
    import logging
    with caplog.at_level(logging.INFO, logger="foldseek_tpu"):
        second = multimer_search(small_db, small_db, params, tmp_dir=tmp)
    skips = [r for r in caplog.records if "resume: skipping" in r.getMessage()]
    assert skips  # chain search + expand-align artifacts skipped
    assert second == first


def test_resumed_records_serialize_byte_identical(small_db, tmp_path):
    """A resumed run's output file is byte-identical to the fresh run's:
    parsed records keep their verbatim seq-id text (re-deriving it from
    the parsed float drops one milli — (int)(f32(0.253)*1000) == 252)."""
    from foldseek_tpu.search.resultdb import read_result_db, write_result_db
    params = SearchParams(add_backtrace=True)
    tmp = str(tmp_path / "tmp")
    os.makedirs(tmp)
    first = search(small_db, small_db, params, tmp_dir=tmp)
    p1 = str(tmp_path / "r1")
    write_result_db(first, p1, add_backtrace=True)
    second = search(small_db, small_db, params, tmp_dir=tmp)  # resumed
    p2 = str(tmp_path / "r2")
    write_result_db(second, p2, add_backtrace=True)
    assert open(p1).read() == open(p2).read()
    # and a plain read->write round trip is the identity
    back, has_bt = read_result_db(p1)
    p3 = str(tmp_path / "r3")
    write_result_db(back, p3, add_backtrace=has_bt)
    assert open(p1).read() == open(p3).read()


def test_resultdb_roundtrip_fuzz(tmp_path):
    """Randomized write->read->write byte-identity for the alignment DB
    serialization (the resume/distributed-merge contract)."""
    import numpy as np
    from foldseek_tpu.search.resultdb import read_result_db, write_result_db
    from foldseek_tpu.search.results import AlnResult
    rng = np.random.default_rng(42)
    results = {}
    for qkey in range(20):
        rs = []
        for _ in range(int(rng.integers(0, 8))):
            L = int(rng.integers(5, 300))
            ops = rng.choice(list("MID"), size=L,
                             p=[0.8, 0.1, 0.1]).tolist()
            rs.append(AlnResult(
                db_key=int(rng.integers(0, 1000)),
                score=int(rng.integers(-5, 5000)),
                seq_id=float(rng.random()),
                evalue=float(10.0 ** rng.uniform(-300, 2)),
                q_start=int(rng.integers(0, 100)),
                q_end=int(rng.integers(100, 400)),
                q_len=int(rng.integers(400, 500)),
                t_start=int(rng.integers(0, 100)),
                t_end=int(rng.integers(100, 400)),
                t_len=int(rng.integers(400, 500)),
                backtrace="".join(ops)))
        results[qkey] = rs
    p1 = str(tmp_path / "a")
    write_result_db(results, p1, add_backtrace=True)
    back, has_bt = read_result_db(p1)
    p2 = str(tmp_path / "b")
    write_result_db(back, p2, add_backtrace=has_bt)
    assert open(p1).read() == open(p2).read()
    # and a second parse->write generation stays fixed
    back2, _ = read_result_db(p2)
    p3 = str(tmp_path / "c")
    write_result_db(back2, p3, add_backtrace=True)
    assert open(p2).read() == open(p3).read()
