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


def test_pssm_golden_parity(golden_dir, tmp_path):
    """PSSM ints vs the reference binary's profile2pssm output on the SCOP
    set (context-specific weights + pseudocounts + global bias correction).
    The raw result2profile verb's effective include gate is evalue<1e-3
    (its -e default), mirrored here. Residual mismatches stem from the
    reference's fast log2/pow2 approximations hitting byte-rounding
    boundaries — allowed up to 0.1% of cells."""
    import numpy as np

    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.ops.matrices import blosum62
    from foldseek_tpu.search.profile import pssm_display_scores, result2profile
    from foldseek_tpu.search.results import AlnResult, expand_backtrace

    results = {}
    for line in open(golden_dir / "scop_alnp.tsv"):
        f = line.rstrip("\n").split("\t")
        qkey = int(f[0])
        bt = expand_backtrace(f[11]) if len(f) > 11 else ""
        results.setdefault(qkey, []).append(AlnResult(
            db_key=int(f[1]), score=int(f[2]), seq_id=float(f[3]),
            evalue=float(f[4]), q_start=int(f[5]), q_end=int(f[6]),
            q_len=int(f[7]), t_start=int(f[8]), t_end=int(f[9]),
            t_len=int(f[10]), backtrace=bt))
    import shutil
    scop = tmp_path / "scop"
    scop.mkdir()
    import os
    for fn in os.listdir("/root/reference/example"):
        if "tim" not in fn:
            shutil.copy(os.path.join("/root/reference/example", fn), scop / fn)
    db = create_db([str(scop)], str(tmp_path / "db"))
    profs = result2profile(db, db, results, e_profile=1e-3, same_db=True)
    gold = {}
    cur = None
    for line in open(golden_dir / "scop_pssm.tsv"):
        if line.startswith("Query profile of sequence"):
            cur = int(line.rsplit(" ", 1)[1])
            gold[cur] = []
        elif line[0].isdigit():
            gold[cur].append([int(x) for x in line.rstrip("\n").split("\t")[2:22]])
    mb = blosum62()
    total = bad = 0
    for key in sorted(gold):
        g = np.array(gold[key])
        mine = pssm_display_scores(profs[key].prob_aa, mb.p_back)
        assert mine.shape == g.shape
        d = np.abs(mine - g)
        total += d.size
        bad += int((d > 0).sum())
        assert d.max() <= 3
    assert bad / total < 1e-3, f"{bad}/{total}"


def test_profile_vs_sequence_search(example_dir, tmp_path):
    """Profile-query search mode: a saved result2profile DB searched against
    the sequence DB (reference Alignment.cpp profile path). The save/load
    round trip must not change results, and every profile must find its own
    source structure as the top hit."""
    import numpy as np

    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import profile_search, search
    from foldseek_tpu.search.profile import (load_profile_db, result2profile,
                                             save_profile_db)

    files = [str(example_dir / n) for n in
             ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_", "d1x9fd_")]
    db = create_db(files, str(tmp_path / "db"))
    params = SearchParams(add_backtrace=True)
    base = search(db, db, params, same_db=True)
    profiles = result2profile(db, db, base, same_db=True)
    save_profile_db(profiles, str(tmp_path / "profdb"))
    loaded = load_profile_db(str(tmp_path / "profdb"))

    a = profile_search(profiles, db, params)
    b = profile_search(loaded, db, params)
    fmt = {k: [(r.db_key, r.score, r.evalue) for r in v] for k, v in a.items()}
    fmt_b = {k: [(r.db_key, r.score, r.evalue) for r in v] for k, v in b.items()}
    assert fmt == fmt_b
    for qkey, rs in a.items():
        assert rs, qkey
        assert rs[0].db_key == qkey  # self is top hit
        assert rs[0].evalue < 1e-10
    # the globin profile must hit the other globins
    name_to_key = {db.names[i]: int(db.keys[i]) for i in range(db.size)}
    asha = name_to_key["d1asha_"]
    hits = {r.db_key for r in a[asha]}
    assert name_to_key["d1mbaa_"] in hits
    assert name_to_key["d1itha_"] in hits
