"""Profile (PSSM) construction + iterative profile search."""
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scop_db(example_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("prof")
    from foldseek_tpu.ingest.createdb import create_db
    files = [str(f) for f in sorted(example_dir.iterdir())
             if "tim" not in f.name][:10]
    return create_db(files, str(d / "db"))


def test_single_sequence_profile_close_to_submat(scop_db):
    """A profile from only the query itself should roughly reproduce the
    substitution-matrix row scores for its own residues."""
    from foldseek_tpu.ops.matrices import blosum62
    from foldseek_tpu.search.profile import result2profile, profile_query
    profiles = result2profile(scop_db, scop_db, {int(scop_db.keys[0]): []})
    p = profiles[int(scop_db.keys[0])]
    qp = profile_query(p)
    mb = blosum62(1.4)
    q_aa = np.asarray(scop_db.get_aa(0))
    # the profile's own-residue score should be positive almost everywhere
    own = qp.prof_aa[q_aa, np.arange(len(q_aa))]
    assert (own > 0).mean() > 0.9
    # and correlate with the substitution matrix diagonal
    diag = mb.scores[q_aa, q_aa]
    assert np.corrcoef(own, diag)[0, 1] > 0.3


def test_iterative_search_keeps_true_hits(scop_db):
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import iterative_search, search
    params = SearchParams(max_seqs=10)
    base = search(scop_db, scop_db, params, same_db=True)
    iterated = iterative_search(scop_db, scop_db, params, 2, same_db=True)
    assert set(iterated) == set(base)
    # self hits must survive profile iteration
    for qkey, rs in iterated.items():
        assert rs, f"query {qkey} lost all hits"
        assert any(r.db_key == qkey for r in rs)
    # hit recall should not collapse
    n_base = sum(len(v) for v in base.values())
    n_iter = sum(len(v) for v in iterated.values())
    assert n_iter >= 0.5 * n_base
