"""Taxonomy suite: lca (LCA + weighted majority voting), filtertaxdb,
easy-taxonomy workflow, and the util long-tail verbs
(reference: lib/mmseqs/src/taxonomy/{lca,filtertaxdb}.cpp,
NcbiTaxonomy::weightedMajorityLCA, data/easytaxonomy.sh)."""
import os

import numpy as np
import pytest

from foldseek_tpu.cli import main
from foldseek_tpu.db.taxonomy import (NcbiTaxonomy, TaxonomyExpression,
                                      VOTE_MINUS_LOG_EVAL, lca_assign,
                                      weighted_majority_lca)

# toy tree:  1 (root) -> 1000 (superkingdom) -> 2000 (phylum)
#            2000 -> 2100 (genus) -> 2110, 2120 (species)
#            2000 -> 2200 (genus) -> 2210 (species)
NODES = """1\t|\t1\t|\tno rank\t|
1000\t|\t1\t|\tsuperkingdom\t|
2000\t|\t1000\t|\tphylum\t|
2100\t|\t2000\t|\tgenus\t|
2110\t|\t2100\t|\tspecies\t|
2120\t|\t2100\t|\tspecies\t|
2200\t|\t2000\t|\tgenus\t|
2210\t|\t2200\t|\tspecies\t|
"""
NAMES = """1\t|\troot\t|\t\t|\tscientific name\t|
1000\t|\tBacteria\t|\t\t|\tscientific name\t|
2000\t|\tProteos\t|\t\t|\tscientific name\t|
2100\t|\tEscher\t|\t\t|\tscientific name\t|
2110\t|\tE. coli\t|\t\t|\tscientific name\t|
2120\t|\tE. albertii\t|\t\t|\tscientific name\t|
2200\t|\tSalmo\t|\t\t|\tscientific name\t|
2210\t|\tS. enterica\t|\t\t|\tscientific name\t|
"""


@pytest.fixture(scope="module")
def taxdump(tmp_path_factory):
    d = tmp_path_factory.mktemp("taxdump")
    (d / "nodes.dmp").write_text(NODES)
    (d / "names.dmp").write_text(NAMES)
    return str(d)


@pytest.fixture(scope="module")
def tax(taxdump):
    return NcbiTaxonomy(taxdump)


def test_plain_lca(tax):
    assert tax.lca([2110, 2120]) == 2100          # two species, one genus
    assert tax.lca([2110, 2210]) == 2000          # cross-genus -> phylum
    assert tax.lca([2110]) == 2110


def test_weighted_majority_species_wins(tax):
    # 3 hits on E. coli vs 1 on S. enterica: E. coli holds 75% >= 0.6
    taxa = [(2110, 1.0), (2110, 1.0), (2110, 1.0), (2210, 1.0)]
    assert weighted_majority_lca(tax, taxa, 0.6) == 2110


def test_weighted_majority_backs_off_to_ancestor(tax):
    # split vote: no species reaches 0.6, but the genus 2100 accumulates
    # both E. coli and E. albertii weights (2/3 >= 0.6)
    taxa = [(2110, 1.0), (2120, 1.0), (2210, 1.0)]
    assert weighted_majority_lca(tax, taxa, 0.6) == 2100


def test_weighted_majority_evalue_weights(tax):
    # -log(evalue) weighting: one extremely significant S. enterica hit
    # outweighs two marginal E. coli hits
    from foldseek_tpu.db.taxonomy import hit_weight
    taxa = [(2110, hit_weight(0.9, VOTE_MINUS_LOG_EVAL)),
            (2110, hit_weight(0.9, VOTE_MINUS_LOG_EVAL)),
            (2210, hit_weight(1e-30, VOTE_MINUS_LOG_EVAL))]
    assert weighted_majority_lca(tax, taxa, 0.6) == 2210


def test_lca_assign_lines(tax):
    mapping = {10: 2110, 11: 2120, 12: 2210}
    hits = {0: [(10, 1e-5), (11, 1e-5)], 1: [(12, 1e-5)], 2: []}
    lines = lca_assign(tax, hits, mapping)
    assert lines[0] == "2100\tgenus\tEscher"
    assert lines[1] == "2210\tspecies\tS. enterica"
    assert lines[2] == "0\tno rank\tunclassified"


def test_taxonomy_expression(tax):
    assert TaxonomyExpression("2100", tax).matches(2110)
    assert not TaxonomyExpression("2100", tax).matches(2210)
    assert TaxonomyExpression("2100,2200", tax).matches(2210)  # comma = OR
    assert TaxonomyExpression("2000&&!2100", tax).matches(2210)
    assert not TaxonomyExpression("2000&&!2100", tax).matches(2110)
    with pytest.raises(ValueError):
        TaxonomyExpression("__import__('os')", tax).matches(1)


@pytest.fixture()
def tiny_search_setup(tmp_path, taxdump):
    """A target DB with taxid mapping + an alignment result DB."""
    from foldseek_tpu.db.storage import StructDBWriter
    from foldseek_tpu.search.resultdb import write_result_db
    from foldseek_tpu.search.results import AlnResult
    tpath = str(tmp_path / "tdb")
    w = StructDBWriter(tpath)
    rng = np.random.default_rng(0)
    for i in range(3):
        seq = rng.integers(0, 20, size=20).astype(np.int8)
        w.add_entry(i, f"t{i}", f"t{i} hdr", seq, seq,
                    rng.normal(size=(20, 3)).astype(np.float32))
    w.finish()
    with open(os.path.join(tpath, "mapping.tsv"), "w") as f:
        f.write("0\t2110\n1\t2120\n2\t2210\n")

    def r(tkey, ev):
        return AlnResult(db_key=tkey, score=100, seq_id=0.9, evalue=ev,
                         q_start=0, q_end=19, q_len=20,
                         t_start=0, t_end=19, t_len=20)
    res = str(tmp_path / "res")
    write_result_db({0: [r(0, 1e-10), r(1, 1e-8)], 1: [r(2, 1e-9)]},
                    res, add_backtrace=False)
    return tpath, res


def test_lca_verb(tiny_search_setup, taxdump, tmp_path):
    tpath, res = tiny_search_setup
    out = str(tmp_path / "lca.tsv")
    assert main(["lca", tpath, res, out, "--taxdump", taxdump]) == 0
    lines = dict(l.split("\t", 1) for l in open(out).read().splitlines())
    assert lines["0"] == "2100\tgenus\tEscher"
    assert lines["1"] == "2210\tspecies\tS. enterica"


def test_filtertaxdb_verb(tiny_search_setup, taxdump, tmp_path):
    from foldseek_tpu.search.resultdb import read_result_db
    tpath, res = tiny_search_setup
    out = str(tmp_path / "filtered")
    assert main(["filtertaxdb", tpath, res, out,
                 "--taxon-list", "2100", "--taxdump", taxdump]) == 0
    filtered, _ = read_result_db(out)
    assert sorted(r.db_key for r in filtered[0]) == [0, 1]
    assert filtered.get(1, []) == []  # S. enterica hit dropped


def test_summarizeresult_verb(tmp_path):
    from foldseek_tpu.search.resultdb import read_result_db, write_result_db
    from foldseek_tpu.search.results import AlnResult

    def r(tkey, q0, q1):
        return AlnResult(db_key=tkey, score=50, seq_id=0.5, evalue=1e-5,
                         q_start=q0, q_end=q1, q_len=100,
                         t_start=0, t_end=q1 - q0, t_len=100)
    res = str(tmp_path / "res")
    # hit 1 covers 0-60; hit 2 overlaps it fully (10-50); hit 3 is new turf
    write_result_db({0: [r(1, 0, 60), r(2, 10, 50), r(3, 61, 99)]},
                    res, add_backtrace=False)
    out = str(tmp_path / "sum")
    assert main(["summarizeresult", res, out]) == 0
    kept, _ = read_result_db(out)
    assert [x.db_key for x in kept[0]] == [1, 3]


def test_mergeresultsbyset_verb(tmp_path):
    from foldseek_tpu.search.resultdb import read_result_db, write_result_db
    from foldseek_tpu.search.results import AlnResult
    res = str(tmp_path / "res")
    write_result_db({0: [AlnResult(db_key=5, score=9, seq_id=0.5, evalue=1.0,
                                   q_start=0, q_end=9, q_len=10,
                                   t_start=0, t_end=9, t_len=10)]},
                    res, add_backtrace=False)
    tsv = tmp_path / "set.tsv"
    tsv.write_text("5\t50\n5\t51\n")
    out = str(tmp_path / "merged")
    assert main(["mergeresultsbyset", res, str(tsv), out]) == 0
    merged, _ = read_result_db(out)
    assert sorted(r.db_key for r in merged[0]) == [50, 51]


def test_apply_verb(tmp_path):
    from foldseek_tpu.search.resultdb import read_result_db, write_result_db
    from foldseek_tpu.search.results import AlnResult
    res = str(tmp_path / "res")
    write_result_db({0: [AlnResult(db_key=k, score=s, seq_id=0.5, evalue=1.0,
                                   q_start=0, q_end=9, q_len=10,
                                   t_start=0, t_end=9, t_len=10)
                         for k, s in ((1, 10), (2, 99))]},
                    res, add_backtrace=False)
    out = str(tmp_path / "applied")
    # keep only records with score 99 via an external filter program
    assert main(["apply", res, out, "--", "grep", "\t99\t"]) == 0
    applied, _ = read_result_db(out)
    assert [r.db_key for r in applied[0]] == [2]


def test_db2tar_verb(tiny_search_setup, tmp_path):
    import tarfile
    tpath, _ = tiny_search_setup
    out = str(tmp_path / "db.tar")
    assert main(["db2tar", tpath, out]) == 0
    with tarfile.open(out) as tar:
        names = tar.getnames()
        assert sorted(names) == ["t0.pdb", "t1.pdb", "t2.pdb"]
        blob = tar.extractfile("t0.pdb").read().decode()
        assert "ATOM" in blob and blob.rstrip().endswith("END")


def test_setextendeddbtype_verb(tiny_search_setup):
    import json
    tpath, _ = tiny_search_setup
    assert main(["setextendeddbtype", tpath, "--extended-dbtype", "2"]) == 0
    manifest = json.load(open(os.path.join(tpath, "manifest.json")))
    assert manifest["extended_dbtype"] == 2


def test_easy_taxonomy_workflow(tmp_path, taxdump, example_dir):
    """End-to-end: target DB from two domains tagged with taxids; querying
    one of them must assign its own species."""
    from foldseek_tpu.ingest.createdb import create_db
    tdir = str(tmp_path / "tdb")
    create_db([str(example_dir / "d1asha_"), str(example_dir / "d1b0ba_")],
              tdir)
    with open(os.path.join(tdir, "mapping.tsv"), "w") as f:
        f.write("0\t2110\n1\t2210\n")
    prefix = str(tmp_path / "out")
    rc = main(["easy-taxonomy", str(example_dir / "d1asha_"), tdir, prefix,
               str(tmp_path / "tmp"), "--taxdump", taxdump])
    assert rc == 0
    lca_lines = open(prefix + "_lca.tsv").read().splitlines()
    assert len(lca_lines) == 1
    # d1asha_ matches itself (taxid 2110, E. coli) decisively
    assert "2110\tspecies\tE. coli" in lca_lines[0]
    report = open(prefix + "_report").read()
    assert "Bacteria" in report and "E. coli" in report
    assert os.path.getsize(prefix + "_tophit_aln") > 0


def test_createtaxdb_addtaxonomy_flow(tiny_search_setup, taxdump, tmp_path):
    """createtaxdb attaches mapping+taxdump to the DB; addtaxonomy then
    needs no --taxdump and appends taxid/rank/name (+lineage) columns
    (createtaxdb.cpp, addtaxonomy.cpp:70-92)."""
    tpath, res = tiny_search_setup
    mapfile = str(tmp_path / "names2tax.tsv")
    with open(mapfile, "w") as f:
        f.write("t0\t2110\nt1\t2120\nt2\t2210\n")
    assert main(["createtaxdb", tpath, "--ncbi-tax-dump", taxdump,
                 "--tax-mapping-file", mapfile]) == 0
    assert os.path.isfile(os.path.join(tpath, "taxdump", "nodes.dmp"))
    out = str(tmp_path / "withtax")
    assert main(["addtaxonomy", tpath, res, out, "--tax-lineage", "2"]) == 0
    rows = [l.split("\t") for l in open(out).read().splitlines()]
    assert len(rows) == 3
    by_target = {r[1]: r for r in rows}
    assert by_target["0"][-4:-1] == ["2110", "species", "E. coli"]
    assert by_target["2"][-4:-1] == ["2210", "species", "S. enterica"]
    assert by_target["0"][-1].split(";")[-1] == "2110"  # taxid lineage


def test_majoritylca_verb(tiny_search_setup, taxdump, tmp_path):
    """majoritylca = lca with weighted majority voting at 0.5."""
    tpath, res = tiny_search_setup
    out = str(tmp_path / "mlca.tsv")
    assert main(["majoritylca", tpath, res, out, "--taxdump", taxdump]) == 0
    lines = dict(l.split("\t", 1) for l in open(out).read().splitlines())
    # query 0: E. coli (1e-10) outweighs E. albertii (1e-8)? both under
    # genus 2100; with -log(e) weights the species split -> best candidate
    assert lines["0"].split("\t")[0] in ("2100", "2110")
    assert lines["1"].split("\t")[0] == "2210"


def test_filtertaxseqdb_verb(tiny_search_setup, taxdump, tmp_path):
    """filtertaxseqdb subsets the structure DB by expression and keeps the
    taxonomy attachment on the subset."""
    from foldseek_tpu.db.storage import load_db
    tpath, res = tiny_search_setup
    mapfile = str(tmp_path / "m.tsv")
    with open(mapfile, "w") as f:
        f.write("t0\t2110\nt1\t2120\nt2\t2210\n")
    assert main(["createtaxdb", tpath, "--ncbi-tax-dump", taxdump,
                 "--tax-mapping-file", mapfile]) == 0
    out = str(tmp_path / "sub")
    assert main(["filtertaxseqdb", tpath, out,
                 "--taxon-list", "2100"]) == 0
    sub = load_db(out)
    assert sub.names == ["t0", "t1"]  # genus Escher only
    # negation: everything NOT under genus 2100
    out2 = str(tmp_path / "sub2")
    assert main(["filtertaxseqdb", tpath, out2,
                 "--taxon-list", "!2100"]) == 0
    assert load_db(out2).names == ["t2"]


def test_lca_uses_attached_taxdump(tiny_search_setup, taxdump, tmp_path):
    """After createtaxdb, lca/filtertaxdb need no --taxdump flag (the
    attachment in <db>/taxdump is picked up)."""
    tpath, res = tiny_search_setup
    mapfile = str(tmp_path / "m.tsv")
    with open(mapfile, "w") as f:
        f.write("t0\t2110\nt1\t2120\nt2\t2210\n")
    assert main(["createtaxdb", tpath, "--ncbi-tax-dump", taxdump,
                 "--tax-mapping-file", mapfile]) == 0
    out = str(tmp_path / "lca.tsv")
    assert main(["lca", tpath, res, out]) == 0
    lines = dict(l.split("\t", 1) for l in open(out).read().splitlines())
    assert lines["0"] == "2100\tgenus\tEscher"
    out2 = str(tmp_path / "filt")
    assert main(["filtertaxdb", tpath, res, out2,
                 "--taxon-list", "2100"]) == 0
