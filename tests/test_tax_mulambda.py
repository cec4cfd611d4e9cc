"""Taxonomy columns + samplemulambda EVD fit."""
import numpy as np
import pytest


def test_evd_fit_recovers_parameters():
    from foldseek_tpu.search.samplemulambda import evd_max_likelihood_fit
    rng = np.random.RandomState(0)
    mu_true, lam_true = 50.0, 0.3
    samples = mu_true - np.log(-np.log(rng.uniform(size=5000))) / lam_true
    mu, lam = evd_max_likelihood_fit(samples)
    assert abs(mu - mu_true) < 1.0
    assert abs(lam - lam_true) < 0.02


def test_samplemulambda_reasonable(example_dir, tmp_path):
    from foldseek_tpu.ingest.createdb import create_db
    from foldseek_tpu.search.samplemulambda import sample_mu_lambda
    db = create_db([str(example_dir / "d1asha_"), str(example_dir / "d1mbaa_")],
                   str(tmp_path / "db"))
    fits = sample_mu_lambda(db, db, n_samples=50)
    for key, (mu, lam) in fits.items():
        assert 0 < mu < 200, (key, mu)
        assert 0.05 < lam < 2.0, (key, lam)


def test_taxonomy_columns(example_dir, tmp_path):
    from foldseek_tpu.cli import main
    mapping = tmp_path / "map.tsv"
    mapping.write_text("d1asha_\t9606\nd1mbaa_\t10090\n")
    rc = main(["createdb", str(example_dir / "d1asha_"),
               str(example_dir / "d1mbaa_"), str(tmp_path / "db"),
               "--tax-mapping-file", str(mapping), "-v", "1"])
    assert rc == 0
    from foldseek_tpu.db.storage import load_db
    from foldseek_tpu.search.params import SearchParams
    from foldseek_tpu.search.pipeline import search
    from foldseek_tpu.search.convertalis import format_results
    db = load_db(str(tmp_path / "db"))
    results = search(db, db, SearchParams(exhaustive_search=True), same_db=True)
    lines = format_results(db, db, results, "query,target,taxid,taxname")
    taxids = {l.split("\t")[1]: l.split("\t")[2] for l in lines}
    assert taxids["d1asha_"] == "9606"
    assert taxids["d1mbaa_"] == "10090"
