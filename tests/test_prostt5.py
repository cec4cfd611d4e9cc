"""ProstT5: T5-encoder numerics vs the transformers reference, head shapes."""
import numpy as np
import pytest


def _hf_to_params(hf_model, cfg):
    """Convert a transformers T5EncoderModel state dict to our tree."""
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}."
        layers.append({
            "attn_norm": sd[p + "layer.0.layer_norm.weight"],
            "wq": sd[p + "layer.0.SelfAttention.q.weight"].T,
            "wk": sd[p + "layer.0.SelfAttention.k.weight"].T,
            "wv": sd[p + "layer.0.SelfAttention.v.weight"].T,
            "wo": sd[p + "layer.0.SelfAttention.o.weight"].T,
            "ffn_norm": sd[p + "layer.1.layer_norm.weight"],
            "ffn_up": sd[p + "layer.1.DenseReluDense.wi.weight"].T,
            "ffn_down": sd[p + "layer.1.DenseReluDense.wo.weight"].T,
        })
    return {
        "embed": sd["shared.weight"],
        "final_norm": sd["encoder.final_layer_norm.weight"],
        "rel_bias": sd["encoder.block.0.layer.0.SelfAttention"
                       ".relative_attention_bias.weight"],
        "layers": layers,
        "conv0_w": np.zeros((32, cfg.d_model, 1, 7), np.float32),
        "conv0_b": np.zeros(32, np.float32),
        "conv3_w": np.zeros((20, 32, 1, 7), np.float32),
        "conv3_b": np.zeros(20, np.float32),
    }


def test_t5_encoder_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers import T5Config, T5EncoderModel

    from foldseek_tpu.nn.prostt5 import ProstT5Config, encoder_forward
    cfg = ProstT5Config.tiny()
    hf_cfg = T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        num_heads=cfg.num_heads, d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        relative_attention_num_buckets=cfg.rel_buckets,
        relative_attention_max_distance=cfg.rel_max_distance,
        feed_forward_proj="relu", dropout_rate=0.0, is_encoder_decoder=False,
        use_cache=False)
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()
    params = _hf_to_params(hf, cfg)

    rng = np.random.RandomState(1)
    B, T = 2, 24
    tokens = rng.randint(0, cfg.vocab_size, (B, T)).astype(np.int32)
    mask = np.ones((B, T), dtype=bool)
    mask[1, 17:] = False
    tokens[1, 17:] = 0

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(tokens, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long)
                 ).last_hidden_state.numpy()

    import jax.numpy as jnp
    mine = np.asarray(encoder_forward(params, cfg, jnp.asarray(tokens),
                                      jnp.asarray(mask),
                                      compute_dtype=jnp.float32, head=False))
    valid = mask[:, :, None] & np.ones_like(ref, bool)
    diff = np.abs(mine - ref)[valid[..., 0]]
    assert diff.max() < 2e-3, diff.max()


def test_prostt5_predict_shapes():
    from foldseek_tpu.nn.prostt5 import (ProstT5, ProstT5Config,
                                         init_random_params)
    cfg = ProstT5Config.tiny()
    tok = {"<AA2fold>": 3, "</s>": 1, "▁X": 2}
    tok.update({f"▁{c}": 4 + i for i, c in enumerate("ACDEFGHIKLMNPQRSTVWY")})
    model = ProstT5(cfg=cfg, params=init_random_params(cfg), token_id=tok)
    seqs = ["MKTAYIAKQR", "ACDEFGHIKL" * 5, "WW"]
    res = model.predict(seqs)
    assert [len(r) for r in res] == [len(s) for s in seqs]
    assert all(set(r) <= set("ACDEFGHIKLMNPQRSTVWY") for r in res)
