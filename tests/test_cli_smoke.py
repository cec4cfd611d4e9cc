"""Smoke coverage of every registered CLI verb (reference surface:
src/FoldseekBase.cpp:17-442).

Every COMMANDS entry must at least survive argument parsing (--help), and
the simple file-management verbs are driven end-to-end on trivial inputs —
this is the fence for bugs like the round-2 `rmdb` NameError that only
fired on execution."""
import os

import numpy as np
import pytest

from foldseek_tpu.cli import COMMANDS, main


@pytest.mark.parametrize("verb", sorted(COMMANDS))
def test_verb_help_parses(verb, capsys):
    """Each verb's parser builds and answers --help without crashing."""
    try:
        rc = main([verb, "--help"])
    except SystemExit as e:  # argparse --help exits 0
        rc = e.code
    assert not rc
    assert capsys.readouterr().out  # printed a usage text


def _write_tiny_db(tmp_path, name="db"):
    from foldseek_tpu.db.storage import StructDBWriter
    path = str(tmp_path / name)
    w = StructDBWriter(path)
    rng = np.random.default_rng(0)
    for i in range(3):
        seq = rng.integers(0, 20, size=12).astype(np.int8)
        ca = rng.normal(size=(12, 3)).astype(np.float32) * 5
        w.add_entry(i, f"e{i}", f"e{i} test", seq, seq, ca)
    w.finish()
    return path


def _write_result_db(tmp_path, name="res"):
    from foldseek_tpu.search.resultdb import write_result_db
    from foldseek_tpu.search.results import AlnResult
    path = str(tmp_path / name)
    r = AlnResult(db_key=1, score=42, seq_id=0.5, evalue=1e-3,
                  q_start=0, q_end=9, q_len=12,
                  t_start=0, t_end=9, t_len=12, backtrace="M" * 10)
    write_result_db({0: [r]}, path, add_backtrace=True)
    return path


def test_mvdb_rmdb_roundtrip(tmp_path):
    db = _write_tiny_db(tmp_path)
    dst = str(tmp_path / "moved")
    assert main(["mvdb", db, dst]) == 0
    assert not os.path.exists(db) and os.path.isdir(dst)
    assert main(["rmdb", dst]) == 0
    assert not os.path.exists(dst)


def test_rmdb_plain_file(tmp_path):
    f = tmp_path / "plain.tsv"
    f.write_text("x\n")
    assert main(["rmdb", str(f)]) == 0
    assert not f.exists()


def test_swapresults_recomputes_evalue(tmp_path):
    db = _write_tiny_db(tmp_path)
    res = _write_result_db(tmp_path)
    out = str(tmp_path / "swapped")
    assert main(["swapresults", db, db, res, out]) == 0
    from foldseek_tpu.search.resultdb import read_result_db
    swapped, has_bt = read_result_db(out)
    assert has_bt
    [r] = swapped[1]
    assert r.db_key == 0
    # swapResult e-value: ALP Gumbel model over the new target DB
    # (36 residues), pre-swap target length 12, stored bit score 42
    from foldseek_tpu.search.alp import AlpEvaluer
    assert r.evalue == pytest.approx(AlpEvaluer(36.0).swapped_evalue(42.0, 12.0))
    assert r.backtrace == "M" * 10  # M-only backtrace unchanged by I<->D swap


def test_warmup_verb(tmp_path):
    """warmup runs both prefilter modes against a real DB without error
    (compile-cache population path)."""
    import pathlib
    example = pathlib.Path("/root/reference/example")
    files = [str(example / n) for n in ("d1asha_", "d1mbaa_", "d1or4a_")]
    db = str(tmp_path / "db")
    assert main(["createdb"] + files + [db, "-v", "1"]) == 0
    assert main(["warmup", db, "--query-lengths", "50,120", "-v", "2"]) == 0


def test_param_range_validation(tmp_path):
    """Out-of-range flag values fail with the flag's name, like the
    reference's per-parameter regex checks (Parameters.cpp)."""
    db = _write_tiny_db(tmp_path)
    with pytest.raises(SystemExit, match="cov-thr"):
        main(["search", db, db, str(tmp_path / "r"), str(tmp_path / "t"),
              "-c", "1.5"])
    with pytest.raises(SystemExit, match="alignment-type"):
        main(["search", db, db, str(tmp_path / "r"), str(tmp_path / "t"),
              "--alignment-type", "9"])
    with pytest.raises(SystemExit, match="sensitivity"):
        main(["search", db, db, str(tmp_path / "r"), str(tmp_path / "t"),
              "-s", "99"])


def test_createdb_survives_malformed_inputs(tmp_path, example_dir):
    """Malformed/truncated/binary inputs are logged and skipped; valid
    files in the same batch still ingest (structcreatedb fail counters)."""
    import gzip
    import shutil
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "empty.pdb").write_text("")
    (bad / "garbage.pdb").write_bytes(b"NOT A PDB\x00\xff junk\n" * 10)
    (bad / "trunc.cif").write_text("data_X\n_atom_site.group_PDB\n")
    (bad / "trunc.pdb.gz").write_bytes(b"\x1f\x8b\x08\x00partial")
    shutil.copy(str(example_dir / "d1asha_"), str(bad / "good.pdb"))
    db = str(tmp_path / "db")
    assert main(["createdb", str(bad), db, "-v", "1"]) == 0
    from foldseek_tpu.db.storage import load_db
    assert load_db(db).names == ["good"]


def test_createdb_include_exclude_filters(tmp_path, example_dir):
    """--file-include/--file-exclude regexes on directory walks, and
    --tar-include on tar members (LocalParameters.cpp:29-30)."""
    import shutil
    import tarfile
    d = tmp_path / "dir"
    d.mkdir()
    shutil.copy(str(example_dir / "d1asha_"), str(d / "d1asha_"))
    shutil.copy(str(example_dir / "d1mbaa_"), str(d / "d1mbaa_"))
    db1 = str(tmp_path / "db1")
    assert main(["createdb", str(d), db1, "--file-include", "asha",
                 "-v", "1"]) == 0
    from foldseek_tpu.db.storage import load_db
    assert load_db(db1).names == ["d1asha_"]
    db2 = str(tmp_path / "db2")
    assert main(["createdb", str(d), db2, "--file-exclude", "asha",
                 "-v", "1"]) == 0
    assert load_db(db2).names == ["d1mbaa_"]
    t = tmp_path / "in.tar"
    with tarfile.open(t, "w") as tar:
        tar.add(str(d / "d1asha_"), arcname="d1asha_")
        tar.add(str(d / "d1mbaa_"), arcname="d1mbaa_")
    db3 = str(tmp_path / "db3")
    assert main(["createdb", str(t), db3, "--tar-include", "mbaa",
                 "-v", "1"]) == 0
    assert load_db(db3).names == ["d1mbaa_"]


def test_createdb_input_format_forcing(tmp_path, example_dir):
    """--input-format forces the parser: a PDB file without any extension
    parses as PDB under format 1 and identically to auto-detect."""
    import shutil
    from foldseek_tpu.db.storage import load_db
    src = tmp_path / "noext"
    shutil.copy(str(example_dir / "d1asha_"), str(src))
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    assert main(["createdb", str(src), a, "-v", "1"]) == 0
    assert main(["createdb", str(src), b, "--input-format", "1",
                 "-v", "1"]) == 0
    da, db_ = load_db(a), load_db(b)
    assert da.get_aa_str(0) == db_.get_aa_str(0)
    assert da.get_ss_str(0) == db_.get_ss_str(0)


def test_createdb_write_lookup_and_coord_mode(tmp_path, example_dir):
    db = str(tmp_path / "db")
    assert main(["createdb", str(example_dir / "1tim.pdb.gz"), db,
                 "--write-lookup", "1", "--coord-store-mode", "2",
                 "-v", "1"]) == 0
    rows = [l.split("\t") for l in open(db + ".lookup").read().splitlines()]
    assert [r[1] for r in rows] == ["1tim_A", "1tim_B"]
    assert all(r[2] == "0" for r in rows)  # same source file
    assert os.path.getsize(os.path.join(db, "ca16.bin")) > 0


def test_easy_search_mode4_header(tmp_path, example_dir):
    """easy-search --format-mode 4 emits the same column-header output as
    convertalis (they previously diverged)."""
    out = str(tmp_path / "o.m8")
    assert main(["easy-search", str(example_dir / "d1asha_"),
                 str(example_dir / "d1mbaa_"), out, str(tmp_path / "t"),
                 "--format-mode", "4", "-v", "1"]) == 0
    first = open(out).readline()
    assert first.startswith("query\ttarget\t")


def test_input_format_validation(tmp_path, example_dir):
    with pytest.raises(SystemExit, match="input-format"):
        main(["createdb", str(example_dir / "d1asha_"),
              str(tmp_path / "x"), "--input-format", "9"])
    # forced foldcomp on a non-foldcomp file is an ingest failure, not a
    # silent PDB parse
    db = str(tmp_path / "db")
    assert main(["createdb", str(example_dir / "d1asha_"), db,
                 "--input-format", "5", "-v", "1"]) == 0
    from foldseek_tpu.db.storage import load_db
    assert load_db(db).size == 0  # logged + skipped, nothing ingested
