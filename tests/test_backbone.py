"""C-alpha-only backbone rebuild: PULCHRA parity."""
import numpy as np

THREE_DI = "ACDEFGHIKLMNPQRSTVWY"


def _strip_to_ca(src, dst):
    with open(dst, "w") as out:
        for line in open(src):
            if line.startswith("ATOM") and line[12:16].strip() == "CA":
                out.write(line)


def test_ca_only_3di_matches_reference(example_dir, golden_dir, tmp_path):
    """3Di of rebuilt backbones must equal the reference binary's output on
    the same CA-stripped inputs (golden: reference structureto3didescriptor
    over CA-only PDBs; PulchraWrapper + lib/pulchra path)."""
    from foldseek_tpu.ingest import pdb as pdbp
    from foldseek_tpu.ingest.backbone import rebuild_backbone
    from foldseek_tpu.ingest.encoder3di import encode_chain

    gold = {}
    for line in open(golden_dir / "ca_only_3di.tsv"):
        f = line.rstrip("\n").split("\t")
        gold[f[0]] = f[2]
    total = same = 0
    for name, gss in gold.items():
        stripped = tmp_path / name
        _strip_to_ca(str(example_dir / name), str(stripped))
        ch = pdbp.parse_structure(str(stripped)).chains[0]
        n2, c2 = rebuild_backbone(ch.ca, ch.aa)
        states = encode_chain(ch.ca, n2, c2, np.full_like(ch.ca, np.nan))
        mine = "".join(THREE_DI[s] for s in states)
        assert len(mine) == len(gss), name
        same += sum(a == b for a, b in zip(mine, gss))
        total += len(gss)
    assert same / total >= 0.99, f"{same}/{total}"


def test_rebuild_backbone_placement(example_dir):
    """Rebuilt N/C atoms must sit close to the true backbone."""
    from foldseek_tpu.ingest import pdb as pdbp
    from foldseek_tpu.ingest.backbone import rebuild_backbone

    for name in ("d1asha_", "d1mbaa_", "d1x9fd_"):
        ch = pdbp.parse_structure(str(example_dir / name)).chains[0]
        n2, c2 = rebuild_backbone(ch.ca, ch.aa)
        valid = ~np.isnan(n2[:, 0]) & ~np.isnan(ch.n[:, 0])
        err_n = np.linalg.norm(n2[valid] - ch.n[valid], axis=1).mean()
        valid_c = ~np.isnan(c2[:, 0]) & ~np.isnan(ch.c[:, 0])
        err_c = np.linalg.norm(c2[valid_c] - ch.c[valid_c], axis=1).mean()
        assert err_n < 0.25, err_n
        assert err_c < 0.25, err_c


def test_rebuild_backbone_gappy_fallback():
    """Chains with NaN gaps use the linear fallback without crashing."""
    from foldseek_tpu.ingest.backbone import rebuild_backbone
    rng = np.random.RandomState(0)
    t = np.arange(30) * 0.6
    ca = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * t], 1)
    ca[7] = np.nan
    n2, c2 = rebuild_backbone(ca.astype(np.float32))
    assert np.isnan(n2[7]).all()
    assert np.isfinite(n2[3]).all()
