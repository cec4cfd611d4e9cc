"""C-alpha-only backbone rebuild quality."""
import numpy as np


def test_rebuild_backbone_3di_identity(example_dir):
    from foldseek_tpu.ingest import pdb as pdbp
    from foldseek_tpu.ingest.backbone import rebuild_backbone
    from foldseek_tpu.ingest.encoder3di import encode_chain
    idents = []
    for name in ("d1asha_", "d1mbaa_", "d1x9fd_"):
        st = pdbp.parse_structure(str(example_dir / name))
        ch = st.chains[0]
        true_states = np.asarray(encode_chain(ch.ca, ch.n, ch.c, ch.cb))
        n2, c2 = rebuild_backbone(ch.ca)
        # placement accuracy vs the real backbone
        valid = ~np.isnan(n2[:, 0]) & ~np.isnan(ch.n[:, 0])
        err_n = np.linalg.norm(n2[valid] - ch.n[valid], axis=1).mean()
        assert err_n < 0.3, err_n
        rebuilt = np.asarray(encode_chain(ch.ca, n2, c2,
                                          np.full_like(ch.ca, np.nan)))
        idents.append((true_states == rebuilt).mean())
    assert np.mean(idents) > 0.8, idents
