"""Module-level aligner/cluster verbs over an existing result DB
(reference: foldseek's structurealign/tmalign/lolalign/
structurerescorediagonal/clust/rbh/multimersearch commands)."""
import os

import pytest


@pytest.fixture(scope="module")
def small_setup(example_dir, tmp_path_factory):
    from foldseek_tpu.cli import main
    d = tmp_path_factory.mktemp("modverbs")
    db = str(d / "db")
    files = [str(example_dir / n)
             for n in ("d1asha_", "d1mbaa_", "d1or4a_", "d1itha_")]
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    aln0 = str(d / "aln0")
    assert main(["search", db, db, aln0, str(d / "t0"),
                 "--exhaustive-search", "1", "-v", "1"]) == 0
    return db, aln0, d


@pytest.mark.parametrize("verb", ["structurealign", "tmalign", "lolalign",
                                  "structurerescorediagonal"])
def test_module_aligners(small_setup, verb):
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db
    db, aln0, d = small_setup
    out = str(d / f"out_{verb}")
    assert main([verb, db, db, aln0, out, "-v", "1"]) == 0
    results, _ = read_result_db(out)
    assert len(results) == 4
    # self hits must rank first for every aligner
    for qkey, rs in results.items():
        assert rs[0].db_key == qkey


def test_clust_verb(small_setup):
    from foldseek_tpu.cli import main
    db, aln0, d = small_setup
    out = str(d / "clu.tsv")
    assert main(["clust", db, aln0, out, "-v", "1"]) == 0
    lines = [l.split("\t") for l in open(out)]
    assert len(lines) == 4  # every entry appears once as member


def test_rbh_verb(small_setup):
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db
    db, aln0, d = small_setup
    out = str(d / "rbhdb")
    assert main(["rbh", db, db, out, str(d / "t2"),
                 "--exhaustive-search", "1", "-v", "1"]) == 0
    results, _ = read_result_db(out)
    assert all(rs[0].db_key == qkey for qkey, rs in results.items())


def test_multimersearch_verb(example_dir, tmp_path):
    from foldseek_tpu.cli import main
    db = str(tmp_path / "db")
    assert main(["createdb", str(example_dir / "1tim.pdb.gz"),
                 str(example_dir / "8tim.pdb.gz"), db, "-v", "1"]) == 0
    out = str(tmp_path / "cpx")
    assert main(["multimersearch", db, db, out, str(tmp_path / "t"),
                 "-v", "1"]) == 0
    body = open(out).read()
    assert body.startswith("#foldseek-tpu complexres") and "\t" in body


def test_util_verbs_roundtrip(small_setup):
    """createtsv / swapresults / mergedbs / filterdb (the reference's
    generic util verbs, lib/mmseqs/src/util/)."""
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db
    db, aln0, d = small_setup
    base, _ = read_result_db(aln0)
    n_total = sum(len(v) for v in base.values())

    # createtsv: one line per record, names resolved
    tsv = str(d / "res.tsv")
    assert main(["createtsv", db, db, aln0, tsv, "-v", "1"]) == 0
    lines = [l.split("\t") for l in open(tsv)]
    assert len(lines) == n_total
    assert lines[0][0].startswith("d1")

    # swapresults: swapping twice restores the original record set
    sw1 = str(d / "swapped")
    sw2 = str(d / "swapped2")
    assert main(["swapresults", db, db, aln0, sw1, "-v", "1"]) == 0
    assert main(["swapresults", db, db, sw1, sw2, "-v", "1"]) == 0
    back, _ = read_result_db(sw2)
    orig = {(q, r.db_key, r.score, r.q_start, r.t_start)
            for q, rs in base.items() for r in rs}
    got = {(q, r.db_key, r.score, r.q_start, r.t_start)
           for q, rs in back.items() for r in rs}
    assert got == orig

    # mergedbs: concatenation doubles every query's list
    mg = str(d / "merged")
    assert main(["mergedbs", aln0, aln0, mg, "-v", "1"]) == 0
    merged, _ = read_result_db(mg)
    assert sum(len(v) for v in merged.values()) == 2 * n_total

    # filterdb: numeric gate on the score column (column 2)
    flt = str(d / "filtered")
    assert main(["filterdb", aln0, flt, "--filter-column", "2",
                 "--comparison-operator", "ge", "--comparison-value", "500",
                 "-v", "1"]) == 0
    filtered, _ = read_result_db(flt)
    for rs in filtered.values():
        for r in rs:
            assert r.score >= 500
    assert 0 < sum(len(v) for v in filtered.values()) < n_total

    # filterdb: tinyexpr-style expression over $N columns
    fe = str(d / "filtered_expr")
    assert main(["filterdb", aln0, fe, "--filter-expression",
                 "($2 >= 500) * ($4 < 1)", "-v", "1"]) == 0
    fexp, _ = read_result_db(fe)
    for rs in fexp.values():
        for r in rs:
            assert r.score >= 500 and r.evalue < 1


def test_flat_output_verbs(small_setup):
    """result2flat / result2repseq / createseqfiledb."""
    from foldseek_tpu.cli import main
    db, aln0, d = small_setup
    flat = str(d / "flat.txt")
    assert main(["result2flat", db, db, aln0, flat, "-v", "1"]) == 0
    text = open(flat).read()
    assert text.count(">") >= 8  # 4 query headers + hits
    rep = str(d / "reps.fasta")
    assert main(["result2repseq", db, aln0, rep, "-v", "1"]) == 0
    assert open(rep).read().count(">") == 4
    clu = str(d / "c.tsv")
    assert main(["clust", db, aln0, clu, "-v", "1"]) == 0
    seqf = str(d / "seqf.txt")
    assert main(["createseqfiledb", db, clu, seqf, "-v", "1"]) == 0
    assert open(seqf).read().count(">") == 4  # every member appears once


def test_mergeclusters_verb(tmp_path):
    from foldseek_tpu.cli import main
    s1 = tmp_path / "s1.tsv"
    s1.write_text("0\t0\n0\t1\n2\t2\n2\t3\n")
    s2 = tmp_path / "s2.tsv"
    s2.write_text("0\t0\n0\t2\n")  # step 2 merges cluster 2 into 0
    out = tmp_path / "merged.tsv"
    assert main(["mergeclusters", str(s1), str(s2), str(out)]) == 0
    lines = sorted(out.read_text().splitlines())
    assert lines == ["0\t0", "0\t1", "0\t2", "0\t3"]


def test_result2rbh_verb(tmp_path):
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db, write_result_db
    from foldseek_tpu.search.results import AlnResult

    def r(tkey, score):
        return AlnResult(db_key=tkey, score=score, seq_id=0.5, evalue=1e-3,
                         q_start=0, q_end=9, q_len=10,
                         t_start=0, t_end=9, t_len=10)
    res = tmp_path / "res"
    write_result_db({0: [r(5, 100), r(6, 100), r(7, 90)],
                     1: [r(8, 50), r(9, 40)]}, str(res), add_backtrace=False)
    out = tmp_path / "rbh"
    assert main(["result2rbh", str(res), str(out)]) == 0
    rbh, _ = read_result_db(str(out))
    assert [x.db_key for x in rbh[0]] == [6]  # ties A's best score
    assert rbh.get(1, []) == []


def test_apply_opaque_output(small_setup):
    """apply with a program whose output is not alignment-shaped writes a
    flat qkey\\t<line> TSV (the reference treats apply output as opaque
    entry bytes, lib/mmseqs/src/util/apply.cpp)."""
    import sys
    from foldseek_tpu.cli import main
    db, aln0, d = small_setup
    out = str(d / "applied_flat")
    prog = [sys.executable, "-c",
            "import sys\n"
            "for line in sys.stdin:\n"
            "    print(line.split('\\t')[0])"]
    assert main(["apply", aln0, out, "--"] + prog) == 0
    lines = [l.rstrip("\n").split("\t") for l in open(out)]
    assert lines and all(len(l) == 2 for l in lines)
    # identity transform stays a typed alignment DB
    out2 = str(d / "applied_id")
    prog_id = [sys.executable, "-c",
               "import sys; sys.stdout.write(sys.stdin.read())"]
    assert main(["apply", aln0, out2, "--"] + prog_id) == 0
    from foldseek_tpu.search.resultdb import read_result_db
    base, _ = read_result_db(aln0)
    same, _ = read_result_db(out2)
    assert sum(len(v) for v in same.values()) == \
        sum(len(v) for v in base.values())


def test_convertalis_uses_stored_backtrace(small_setup):
    """Default m8 columns derive alnlen/mismatch/gapopen from a stored
    backtrace whenever one exists (structureconvertalis.cpp:727), not only
    when the column set demands one."""
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db
    db, _, d = small_setup
    aln_bt = str(d / "aln_bt")
    assert main(["search", db, db, aln_bt, str(d / "tbt"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    base, has_bt = read_result_db(aln_bt)
    assert has_bt
    m8 = str(d / "conv.m8")
    assert main(["convertalis", db, db, aln_bt, m8, "-v", "1"]) == 0
    rows = [l.rstrip("\n").split("\t") for l in open(m8)]
    # every row: alnlen equals the stored backtrace length, not the
    # max-span estimate
    from foldseek_tpu.db.storage import load_db
    dbo = load_db(db)
    key_by_name = {dbo.names[i]: int(dbo.keys[i]) for i in range(dbo.size)}
    for row in rows:
        qk, tk = key_by_name[row[0]], key_by_name[row[1]]
        rec = next(r for r in base[qk] if r.db_key == tk
                   and int(row[6]) == r.q_start + 1)
        assert int(row[3]) == len(rec.backtrace)


def test_lndb_and_renamedbkeys(small_setup, tmp_path):
    """lndb links a DB without copying payload; renamedbkeys rewrites entry
    keys per mapping (lndb.cpp, renamedbkeys.cpp) on both a structure DB
    and a flat result DB."""
    from foldseek_tpu.cli import main
    from foldseek_tpu.db.storage import load_db
    db, aln0, d = small_setup
    linked = str(tmp_path / "linked")
    assert main(["lndb", db, linked]) == 0
    src = load_db(db)
    ln = load_db(linked)
    assert list(ln.keys) == list(src.keys) and ln.names == src.names
    assert os.stat(os.path.join(linked, "aa.npy")).st_ino == \
        os.stat(os.path.join(db, "aa.npy")).st_ino  # hardlink, not a copy
    # rename keys 0->100, 1->101 in the linked DB; source must not change
    mapping = str(tmp_path / "map.tsv")
    with open(mapping, "w") as f:
        f.write("0\t100\n1\t101\n")
    renamed = str(tmp_path / "renamed")
    assert main(["renamedbkeys", mapping, linked, renamed]) == 0
    rn = load_db(renamed)
    assert sorted(int(k) for k in rn.keys) == \
        sorted(100 if k == 0 else 101 if k == 1 else k
               for k in (int(x) for x in src.keys))
    assert list(load_db(db).keys) == list(src.keys)  # source untouched
    # flat result DB re-keying
    from foldseek_tpu.search.resultdb import read_result_db
    raln = str(tmp_path / "aln_renamed")
    assert main(["renamedbkeys", mapping, aln0, raln]) == 0
    base, _ = read_result_db(aln0)
    out, _ = read_result_db(raln)
    assert set(out) == {100 if k == 0 else 101 if k == 1 else k
                        for k in base}


def test_tsv2db_roundtrip(small_setup, tmp_path):
    """createtsv-style flat rows -> tsv2db -> typed alignment DB; opaque
    rows stay a generic keyed DB (tsv2db.cpp)."""
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db
    db, aln0, d = small_setup
    # dump the alignment DB body (strip header) and rebuild it
    body = str(tmp_path / "body.tsv")
    with open(aln0) as f, open(body, "w") as out:
        for line in f:
            if not line.startswith("#"):
                out.write(line)
    rebuilt = str(tmp_path / "rebuilt")
    assert main(["tsv2db", body, rebuilt]) == 0
    a, _ = read_result_db(aln0)
    b, _ = read_result_db(rebuilt)
    assert {k: len(v) for k, v in a.items()} == {k: len(v) for k, v in b.items()}
    # opaque rows
    flat_in = str(tmp_path / "flat.tsv")
    with open(flat_in, "w") as f:
        f.write("0\thello world\n1\topaque data\n")
    flat_out = str(tmp_path / "flatdb")
    assert main(["tsv2db", flat_in, flat_out]) == 0
    assert open(flat_out).read() == open(flat_in).read()


def test_appenddbtoindex(small_setup, tmp_path):
    """appenddbtoindex registers satellite DBs inside the index artifact
    under numeric ids (structureindex.sh reserved keys 500/502)."""
    import json
    from foldseek_tpu.cli import main
    db, aln0, d = small_setup
    work = str(tmp_path / "idxdb")
    assert main(["lndb", db, work]) == 0
    assert main(["createindex", work, str(tmp_path / "itmp"), "-v", "1"]) == 0
    sat = str(tmp_path / "sat")
    assert main(["lndb", db, sat]) == 0
    assert main(["appenddbtoindex", sat, work, "--id-list", "500"]) == 0
    man = json.load(open(os.path.join(work, "index", "manifest.json")))
    assert man["appended"] == {"500": "sat"}
    assert os.path.isfile(os.path.join(work, "index", "appended", "500",
                                       "manifest.json"))


def test_result2msa_unpackdb_flow(small_setup, tmp_path):
    """README's MSA flow (README.md:454-458): search -a -> result2msa
    -> unpackdb. Byte-exact against the reference binary's output
    (tests/golden/msa/, foldseek result2msa --msa-format-mode 6/2 +
    unpackdb on the same 4 domains)."""
    import pathlib
    from foldseek_tpu.cli import main
    golden = pathlib.Path(__file__).parent / "golden" / "msa"
    db, aln0, d = small_setup
    aln = str(tmp_path / "aln_bt")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    msa = str(tmp_path / "msa")
    assert main(["result2msa", db, db, aln, msa,
                 "--msa-format-mode", "6", "-v", "1"]) == 0
    outdir = str(tmp_path / "msas")
    assert main(["unpackdb", msa, outdir, "--unpack-suffix", ".a3m",
                 "--unpack-name-mode", "0"]) == 0
    for f in sorted(golden.glob("*.a3m")):
        got = open(os.path.join(outdir, f.name)).read()
        assert got == f.read_text(), f.name
    # aligned-FASTA default mode
    msa2 = str(tmp_path / "msa2")
    assert main(["result2msa", db, db, aln, msa2, "-v", "1"]) == 0
    outdir2 = str(tmp_path / "msas2")
    assert main(["unpackdb", msa2, outdir2, "--unpack-suffix", ".fas",
                 "--unpack-name-mode", "0"]) == 0
    for f in sorted(golden.glob("*.fas")):
        got = open(os.path.join(outdir2, f.name)).read()
        assert got == f.read_text(), f.name


def test_db_utility_verbs(small_setup, tmp_path, capsys):
    """convert2fasta / sortresult / prefixid / view / dbtype / splitdb /
    concatdbs round-trips (lib/mmseqs/src/util counterparts)."""
    from foldseek_tpu.cli import main
    from foldseek_tpu.db.storage import load_db
    from foldseek_tpu.search.resultdb import read_result_db
    db, aln0, d = small_setup
    dbo = load_db(db)
    # convert2fasta
    fa = str(tmp_path / "out.fasta")
    assert main(["convert2fasta", db, fa]) == 0
    lines = open(fa).read().splitlines()
    assert len(lines) == 2 * dbo.size
    assert lines[1] == dbo.get_aa_str(0)
    # sortresult is idempotent on search output (already canonical)
    srt = str(tmp_path / "sorted")
    assert main(["sortresult", aln0, srt]) == 0
    a, _ = read_result_db(aln0)
    b, _ = read_result_db(srt)
    assert {k: [r.db_key for r in v] for k, v in a.items()} == \
        {k: [r.db_key for r in v] for k, v in b.items()}
    # prefixid --tsv with a mapping
    mapping = str(tmp_path / "map.tsv")
    with open(mapping, "w") as f:
        for i in range(dbo.size):
            f.write(f"{int(dbo.keys[i])}\t{dbo.names[i]}\n")
    pre = str(tmp_path / "prefixed.tsv")
    assert main(["prefixid", aln0, pre, "--mapping-file", mapping,
                 "--tsv"]) == 0
    rows = [l.split("\t")[0] for l in open(pre)]
    assert set(rows) <= set(dbo.names)
    # view one entry
    assert main(["view", db, "--id-list", dbo.names[1]]) == 0
    outv = capsys.readouterr().out
    assert dbo.get_aa_str(1) in outv and dbo.headers[1] in outv
    # dbtype
    assert main(["dbtype", db]) == 0
    assert main(["dbtype", aln0]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["structure", "Alignment"]
    # splitdb: 3 contiguous splits cover the DB in order
    sp = str(tmp_path / "sp")
    assert main(["splitdb", db, sp, "--split", "3"]) == 0
    names = []
    for s in range(3):
        part = load_db(f"{sp}_{s}_3")
        names.extend(part.names)
    assert names == dbo.names
    # concatdbs shifts the second DB's keys past the first
    cat = str(tmp_path / "cat")
    assert main(["concatdbs", f"{sp}_0_3", f"{sp}_1_3", cat]) == 0
    c = load_db(cat)
    a0, a1 = load_db(f"{sp}_0_3"), load_db(f"{sp}_1_3")
    assert c.size == a0.size + a1.size
    assert list(c.keys[:a0.size]) == list(a0.keys)
    assert int(c.keys[a0.size]) == int(a0.keys.max()) + 1 + int(a1.keys[0])
    # --split-aa balances residues
    assert main(["splitdb", db, str(tmp_path / "spa"), "--split", "2",
                 "--split-aa"]) == 0
    p0 = load_db(str(tmp_path / "spa_0_2"))
    p1 = load_db(str(tmp_path / "spa_1_2"))
    assert p0.size + p1.size == dbo.size
    assert abs(p0.total_residues - p1.total_residues) < dbo.total_residues // 2


def test_compress_roundtrip_and_base_prefix(small_setup, tmp_path):
    """compress/decompress zstd round trip; `base:` prefix dispatches to
    the same verb table (foldseek.cpp:12 hide_base_commands)."""
    from foldseek_tpu.cli import main
    db, aln0, d = small_setup
    z = str(tmp_path / "aln.zst")
    back = str(tmp_path / "aln.back")
    assert main(["base:compress", aln0, z]) == 0
    assert os.path.getsize(z) < os.path.getsize(aln0)
    assert main(["decompress", z, back]) == 0
    assert open(back).read() == open(aln0).read()


def test_msa2profile_search(small_setup, tmp_path):
    """result2msa -> msa2profile -> profile search: every profile's top
    hit is its own source structure (msa2profile.cpp analogue; the 3Di
    track comes from --seq-db center sequences)."""
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import profile_search
    from foldseek_tpu.search.profile import is_profile_db, load_profile_db
    from foldseek_tpu.db.storage import load_db
    db, aln0, d = small_setup
    aln = str(tmp_path / "alnbt")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    msa = str(tmp_path / "msa")
    assert main(["result2msa", db, db, aln, msa, "-v", "1"]) == 0
    prof = str(tmp_path / "profdb")
    assert main(["msa2profile", msa, prof, "--seq-db", db, "-v", "1"]) == 0
    assert is_profile_db(prof)
    dbo = load_db(db)
    profiles = load_profile_db(prof)
    assert len(profiles) == dbo.size
    key_by_name = {dbo.names[i]: int(dbo.keys[i]) for i in range(dbo.size)}
    res = profile_search(profiles, dbo, SearchParams())
    for qkey, rs in res.items():
        assert rs, qkey
        assert rs[0].db_key == qkey  # finds its own source first
    # profile lengths equal the center sequence lengths (match-mode 0)
    for name, k in key_by_name.items():
        i = list(dbo.names).index(name)
        assert profiles[k].prob_aa.shape[0] == dbo.entry_len(i)


def test_splitdb_aa_skewed_lengths(tmp_path):
    """--split-aa with residue mass concentrated in the last entry must
    not crash; all entries are still covered exactly once."""
    import numpy as np
    from foldseek_tpu.cli import main
    from foldseek_tpu.db.storage import StructDBWriter, load_db
    path = str(tmp_path / "skew")
    w = StructDBWriter(path)
    rng = np.random.default_rng(0)
    for i, L in enumerate([4, 4, 4, 200]):
        seq = rng.integers(0, 20, size=L).astype(np.int8)
        w.add_entry(i, f"e{i}", f"e{i}", seq, seq,
                    rng.normal(size=(L, 3)).astype(np.float32))
    w.finish()
    assert main(["splitdb", path, str(tmp_path / "sp"), "--split", "4",
                 "--split-aa"]) == 0
    names = []
    for s in range(4):
        names.extend(load_db(str(tmp_path / f"sp_{s}_4")).names)
    assert names == [f"e{i}" for i in range(4)]


def test_concatdbs_keeps_complexes_distinct(example_dir, tmp_path):
    """Concatenating two multimer DBs must not merge complexes: B's
    fileids shift past A's sources (review finding on complex_maps)."""
    from foldseek_tpu.cli import main
    from foldseek_tpu.db.storage import load_db
    from foldseek_tpu.multimer.scoremultimer import complex_maps
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    assert main(["createdb", str(example_dir / "1tim.pdb.gz"), a, "-v", "1"]) == 0
    assert main(["createdb", str(example_dir / "8tim.pdb.gz"), b, "-v", "1"]) == 0
    cat = str(tmp_path / "cat")
    assert main(["concatdbs", a, b, cat]) == 0
    db = load_db(cat)
    chain_to_complex, complex_chains, _ = complex_maps(db)
    assert len(complex_chains) == 2  # 1tim and 8tim stay separate
    assert len(db.sources) == 2


def test_prefixid_output_is_consumable(small_setup, tmp_path):
    """prefixid without --tsv must not claim the alnres dbtype (its key
    column is no longer a numeric key)."""
    from foldseek_tpu.cli import main
    db, aln0, d = small_setup
    out = str(tmp_path / "pre")
    assert main(["prefixid", aln0, out, "--prefix", "X"]) == 0
    body = open(out).read()
    assert not body.startswith("#foldseek-tpu")
    assert all(l.startswith("X\t") for l in body.splitlines())


def test_renamedbkeys_rekeys_tax_mapping(small_setup, tmp_path):
    from foldseek_tpu.cli import main
    db, aln0, d = small_setup
    work = str(tmp_path / "w")
    assert main(["lndb", db, work]) == 0
    with open(os.path.join(work, "mapping.tsv"), "w") as f:
        f.write("0\t1234\n1\t5678\n")
    m = str(tmp_path / "m.tsv")
    with open(m, "w") as f:
        f.write("0\t100\n")
    out = str(tmp_path / "renamed")
    assert main(["renamedbkeys", m, work, out]) == 0
    got = dict(l.split("\t") for l in
               open(os.path.join(out, "mapping.tsv")).read().splitlines())
    assert got == {"100": "1234", "1": "5678"}
    # the hardlinked source mapping is untouched
    src = dict(l.split("\t") for l in
               open(os.path.join(work, "mapping.tsv")).read().splitlines())
    assert src == {"0": "1234", "1": "5678"}


def test_unpackdb_structure_and_gz(small_setup, tmp_path):
    """unpackdb on a structure DB writes per-chain FASTA; a .gz suffix
    compresses each file (unpackdb.cpp zlib path)."""
    import gzip
    from foldseek_tpu.cli import main
    from foldseek_tpu.db.storage import load_db
    db, aln0, d = small_setup
    outdir = str(tmp_path / "files")
    assert main(["unpackdb", db, outdir, "--unpack-suffix", ".fasta.gz",
                 "--unpack-name-mode", "0"]) == 0
    dbo = load_db(db)
    for i, name in enumerate(dbo.names):
        body = gzip.open(os.path.join(outdir, name + ".fasta.gz"),
                         "rt").read()
        assert body == f">{dbo.headers[i]}\n{dbo.get_aa_str(i)}\n"


def test_extractalignedregion_and_filtera3m(small_setup, tmp_path):
    from foldseek_tpu.cli import main
    from foldseek_tpu.db.storage import load_db
    from foldseek_tpu.search.resultdb import read_result_db
    db, aln0, d = small_setup
    # extract target regions: sequence lengths match t_end - t_start + 1
    out = str(tmp_path / "regions.fasta")
    assert main(["extractalignedregion", db, db, aln0, out]) == 0
    base, _ = read_result_db(aln0)
    lines = open(out).read().splitlines()
    n_records = sum(len(v) for v in base.values())
    assert len(lines) == 2 * n_records
    spans = sorted(r.t_end - r.t_start + 1
                   for rs in base.values() for r in rs)
    assert sorted(len(s) for s in lines[1::2]) == spans
    # query mode
    out2 = str(tmp_path / "qreg.fasta")
    assert main(["extractalignedregion", db, db, aln0, out2,
                 "--extract-mode", "1"]) == 0
    qspans = sorted(r.q_end - r.q_start + 1
                    for rs in base.values() for r in rs)
    qlines = open(out2).read().splitlines()
    assert sorted(len(s) for s in qlines[1::2]) == qspans
    # filtera3m keeps every MSA entry header and never grows an MSA
    aln = str(tmp_path / "alnbt")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    msa = str(tmp_path / "msa")
    assert main(["result2msa", db, db, aln, msa, "--msa-format-mode", "5",
                 "-v", "1"]) == 0
    filt = str(tmp_path / "msaf")
    assert main(["filtera3m", msa, filt]) == 0
    raw = open(msa).read()
    fl = open(filt).read()
    assert raw.count("#entry") == fl.count("#entry") == 4
    assert fl.count(">") <= raw.count(">")
    # each center sequence survives the filter
    for block in fl.split("#entry")[1:]:
        assert block.count(">") >= 1


def test_result2stats_and_summarizeheaders(small_setup, tmp_path):
    from foldseek_tpu.cli import main
    from foldseek_tpu.search.resultdb import read_result_db
    db, aln0, d = small_setup
    base, _ = read_result_db(aln0)
    out = str(tmp_path / "counts.tsv")
    assert main(["result2stats", aln0, out]) == 0
    got = dict(l.split("\t") for l in open(out).read().splitlines())
    assert {int(k): int(v) for k, v in got.items()} == \
        {k: len(v) for k, v in base.items()}
    out2 = str(tmp_path / "maxscore.tsv")
    assert main(["result2stats", aln0, out2, "--stat", "max"]) == 0
    got2 = dict(l.split("\t") for l in open(out2).read().splitlines())
    assert {int(k): float(v) for k, v in got2.items()} == \
        {k: max(r.score for r in v) for k, v in base.items()}
    out3 = str(tmp_path / "sum.tsv")
    assert main(["summarizeheaders", db, db, aln0, out3]) == 0
    rows = [l.split("\t") for l in open(out3).read().splitlines()]
    assert len(rows) == len(base)
    assert all(r[1].startswith("cl|") and "|n=" in r[1] for r in rows)


def test_diffseqdbs_and_tar2db(small_setup, tmp_path):
    import tarfile
    from foldseek_tpu.cli import main
    from foldseek_tpu.db.storage import load_db
    db, aln0, d = small_setup
    # new version: drop entry 0, keep 1-3 (subset via createsubdb)
    ids = tmp_path / "ids.txt"
    dbo = load_db(db)
    ids.write_text("\n".join(dbo.names[1:]) + "\n")
    newdb = str(tmp_path / "newdb")
    assert main(["createsubdb", str(ids), db, newdb, "-v", "1"]) == 0
    rem, mp, new = (str(tmp_path / x) for x in ("rem", "map", "new"))
    assert main(["diffseqdbs", db, newdb, rem, mp, new]) == 0
    assert open(rem).read().split() == ["0"]
    pairs = [l.split("\t") for l in open(mp).read().splitlines()]
    assert len(pairs) == 3 and all(a for a, b in pairs)
    assert open(new).read() == ""
    # tar2db round trip with db2tar-able flat content
    t = tmp_path / "in.tar"
    with tarfile.open(t, "w") as tar:
        for name, body in (("a.txt", b"hello\nworld"), ("b.txt", b"line")):
            import io
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tar.addfile(info, io.BytesIO(body))
    flat = str(tmp_path / "flatdb")
    assert main(["tar2db", str(t), flat]) == 0
    rows = [l.split("\t") for l in open(flat).read().splitlines()]
    assert [r[0] for r in rows] == ["0", "0", "1"]
    lookup = dict(l.split("\t") for l in
                  open(flat + ".lookup").read().splitlines())
    assert lookup == {"0": "a.txt", "1": "b.txt"}


def test_createtsv_byte_exact_vs_reference(small_setup, tmp_path):
    """createtsv output is byte-identical to the reference binary's on the
    4-domain exhaustive search (tests/golden/msa/createtsv.tsv)."""
    import pathlib
    from foldseek_tpu.cli import main
    golden = pathlib.Path(__file__).parent / "golden" / "msa"
    db, aln0, d = small_setup
    aln = str(tmp_path / "alnbt")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    tsv = str(tmp_path / "out.tsv")
    assert main(["createtsv", db, db, aln, tsv, "-v", "1"]) == 0
    assert open(tsv).read() == (golden / "createtsv.tsv").read_text()


def test_swapresults_matches_reference(small_setup, tmp_path):
    """swapresults: byte-identical to the reference binary's output,
    including the recomputed e-values (ALP Gumbel fit + finite-size
    area correction, search/alp.py — constants pinned from the
    reference's own deterministic seed-42 fit of mat3di/gap 10-1)."""
    import pathlib
    from foldseek_tpu.cli import main
    golden = pathlib.Path(__file__).parent / "golden" / "msa"
    db, aln0, d = small_setup
    aln = str(tmp_path / "alnbt")
    assert main(["search", db, db, aln, str(tmp_path / "t"),
                 "--exhaustive-search", "1", "-a", "-v", "1"]) == 0
    sw = str(tmp_path / "swapped")
    assert main(["swapresults", db, db, aln, sw, "-v", "1"]) == 0
    tsv = str(tmp_path / "sw.tsv")
    assert main(["createtsv", db, db, sw, tsv, "-v", "1"]) == 0
    assert open(tsv).read() == (golden / "swapped.tsv").read_text()


def test_alp_evaluer_matches_reference_probe():
    """AlpEvaluer vs 24 (bit score, seq len) probe points dumped from the
    reference's EvalueComputation (mat3di, 2.0, 0.0, gap 10/1, dbRes
    123456): raw score and e-value to 1e-12 relative."""
    from foldseek_tpu.search.alp import AlpEvaluer
    ev = AlpEvaluer(123456)
    # (bits, seqlen) -> (rawScore, evalue) from the reference probe
    probes = [
        (10, 30, 15.194596577992284, 3174.4829451625942),
        (10, 1000, 15.194596577992284, 120116.63243027948),
        (50, 250, 102.9203145103952, 2.0446740351751916e-08),
        (100, 120, 212.5774619258988, 5.1388893992774611e-25),
        (300, 1000, 651.20605158791341, 3.4002772378265631e-83),
        (1000, 30, 2186.4061154049641, 0.0),  # exp underflow, like the ref
    ]
    for bits, slen, raw_ref, e_ref in probes:
        raw = ev.raw_score_from_bit_score(bits)
        assert abs(raw - raw_ref) <= 1e-12 * abs(raw_ref)
        e = ev.compute_evalue(raw, slen)
        assert abs(e - e_ref) <= 1e-12 * abs(e_ref), (bits, slen, e, e_ref)
