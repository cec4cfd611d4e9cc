"""ProstT5: 3Di structural alphabet prediction from amino-acid sequence.

TPU-native reimplementation of the reference's GGML/llama.cpp ProstT5 runner
(reference: src/strucclustutils/ProstT5.cpp, lib/prostt5/src/llama.cpp
LLM_ARCH_T5ENCODER graph :9383-9417 tensors, :11230-11295 CNN head):

  tokens  = [<AA2fold>] + [▁A..▁Y per residue] + [</s>]
  x       = T5 encoder (RMSNorm pre-norm, relative-position-bucket attention
            without query scaling, ReLU FFN)
  h       = x[1:-1] padded by one zero row            (llama.cpp:11240-11256)
  logits  = conv1d_k7(h, 1024->32) + b -> relu -> conv1d_k7(32->20) + b
  3Di     = argmax over the 20 states per residue     (ProstT5.cpp:34-65)

The encoder runs as a single jitted function over length-bucketed batches in
bfloat16 matmuls (float32 accumulation); multi-chip execution shards the
batch (data parallel) and the FFN/heads (tensor parallel) over a mesh via
shard_map-compatible einsums — see parallel.mesh.

Weights load from the GGUF file the reference distributes (weights/ in the
foldseek release; `foldseek databases ProstT5`), f32/f16 tensors only.
"""
from __future__ import annotations

import functools
import math
import struct
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ..utils.log import logger

THREE_DI = "ACDEFGHIKLMNPQRSTVWY"  # number_to_char (ProstT5.cpp:8-32)


@dataclass
class ProstT5Config:
    vocab_size: int = 150
    d_model: int = 1024
    d_kv: int = 128
    num_heads: int = 32
    d_ff: int = 16384
    num_layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    conv_hidden: int = 32
    n_states: int = 20

    @staticmethod
    def tiny() -> "ProstT5Config":
        """Small config for compile checks and sharding dry runs."""
        return ProstT5Config(vocab_size=64, d_model=64, d_kv=16, num_heads=4,
                             d_ff=128, num_layers=2)


# ---------------------------------------------------------------------------
# GGUF reader (minimal: header + f32/f16 tensors)

GGUF_MAGIC = 0x46554747
_GGUF_TYPES = {0: "B", 1: "b", 2: "H", 3: "h", 4: "I", 5: "i", 6: "f",
               7: "?", 10: "Q", 11: "q", 12: "d"}
GGML_F32, GGML_F16 = 0, 1


def _read_gguf_value(f, vtype):
    if vtype == 8:  # string
        n = struct.unpack("<Q", f.read(8))[0]
        return f.read(n).decode("utf-8", errors="replace")
    if vtype == 9:  # array
        etype = struct.unpack("<I", f.read(4))[0]
        n = struct.unpack("<Q", f.read(8))[0]
        return [_read_gguf_value(f, etype) for _ in range(n)]
    fmt = _GGUF_TYPES[vtype]
    return struct.unpack("<" + fmt, f.read(struct.calcsize(fmt)))[0]


def read_gguf(path: str):
    """Returns (metadata dict, {tensor name: np.ndarray}). Tensors are
    returned with GGUF's dims reversed into row-major numpy order."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<II", f.read(8))
        if magic != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file")
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
        meta = {}
        for _ in range(n_kv):
            klen = struct.unpack("<Q", f.read(8))[0]
            key = f.read(klen).decode()
            vtype = struct.unpack("<I", f.read(4))[0]
            meta[key] = _read_gguf_value(f, vtype)
        infos = []
        for _ in range(n_tensors):
            nlen = struct.unpack("<Q", f.read(8))[0]
            name = f.read(nlen).decode()
            ndim = struct.unpack("<I", f.read(4))[0]
            dims = struct.unpack(f"<{ndim}Q", f.read(8 * ndim))
            dtype = struct.unpack("<I", f.read(4))[0]
            offset = struct.unpack("<Q", f.read(8))[0]
            infos.append((name, dims, dtype, offset))
        alignment = meta.get("general.alignment", 32)
        base = f.tell()
        base = (base + alignment - 1) // alignment * alignment
        tensors = {}
        for name, dims, dtype, offset in infos:
            count = int(np.prod(dims))
            f.seek(base + offset)
            if dtype == GGML_F32:
                arr = np.frombuffer(f.read(4 * count), dtype=np.float32)
            elif dtype == GGML_F16:
                arr = np.frombuffer(f.read(2 * count), dtype=np.float16).astype(np.float32)
            else:
                raise ValueError(
                    f"{path}: tensor {name} has unsupported ggml dtype {dtype} "
                    "(quantized models are not supported; use an f16/f32 GGUF)")
            # GGUF dims are innermost-first; numpy wants outermost-first
            tensors[name] = arr.reshape(tuple(reversed(dims)))
        return meta, tensors


# ---------------------------------------------------------------------------
# parameters

def load_params_gguf(path: str):
    """Map GGUF tensor names (llama.cpp T5ENCODER layout) to our param tree,
    plus the token vocabulary."""
    meta, t = read_gguf(path)
    return map_gguf_params(meta, t)


def map_gguf_params(meta, t):
    """The name->param-tree mapping, split from file reading so the
    release-manifest test (tests/test_prostt5.py) can drive it against the
    pinned tensor table without a real 11 GB GGUF."""
    arch = meta.get("general.architecture", "?")
    n_layers = meta.get(f"{arch}.block_count")
    cfg = ProstT5Config(
        vocab_size=t["token_embd.weight"].shape[0],
        d_model=meta.get(f"{arch}.embedding_length", 1024),
        d_kv=meta.get(f"{arch}.attention.key_length", 128),
        num_heads=meta.get(f"{arch}.attention.head_count", 32),
        d_ff=meta.get(f"{arch}.feed_forward_length", 16384),
        num_layers=n_layers if n_layers else 24,
        rel_buckets=meta.get(f"{arch}.attention.relative_buckets_count", 32),
    )
    params = {"embed": t["token_embd.weight"],
              "final_norm": t["enc.output_norm.weight"]}
    layers = []
    rel_bias = None
    for i in range(cfg.num_layers):
        prefix = f"enc.blk.{i}."
        layer = {
            "attn_norm": t[prefix + "attn_norm.weight"],
            # llama.cpp stores matmul weights as [out, in]; transpose to
            # x @ W convention
            "wq": t[prefix + "attn_q.weight"].T,
            "wk": t[prefix + "attn_k.weight"].T,
            "wv": t[prefix + "attn_v.weight"].T,
            "wo": t[prefix + "attn_o.weight"].T,
            "ffn_norm": t[prefix + "ffn_norm.weight"],
            "ffn_up": t[prefix + "ffn_up.weight"].T,
            "ffn_down": t[prefix + "ffn_down.weight"].T,
        }
        # flan-style gated FFN when present (the graph builder switches on
        # it: ffn_gate_enc ? GELU/PAR : RELU/SEQ, lib/prostt5 llama.cpp
        # :16557-16565); plain ProstT5 (T5-3B lineage) has no gate
        gate = t.get(prefix + "ffn_gate.weight")
        if gate is not None:
            layer["ffn_gate"] = gate.T
        rb = t.get(prefix + "attn_rel_b.weight")
        if rb is not None:
            rel_bias = rb  # [buckets, heads] after reversal -> check below
        layers.append(layer)
    if rel_bias is None:
        raise ValueError("missing relative attention bias tensor")
    # gguf dims {n_head, n_buckets} reversed -> [n_buckets, n_head]
    params["rel_bias"] = rel_bias
    params["layers"] = layers

    def cnn(which, idx):
        # the released GGUF names the CNN head "classifier.%d" (llama.cpp
        # LLM_TENSOR_CONV1D table for t5encoder, :1520); accept the older
        # synthetic "conv1d.%d" spelling too
        for stem in (f"classifier.{idx}.{which}", f"conv1d.{idx}.{which}"):
            if stem in t:
                return t[stem]
        raise KeyError(f"classifier.{idx}.{which} missing from GGUF")
    params["conv0_w"] = cnn("weight", 0)   # [32, 1024, 1, 7] after reversal
    params["conv0_b"] = cnn("bias", 0)
    params["conv3_w"] = cnn("weight", 3)   # [20, 32, 1, 7]
    params["conv3_b"] = cnn("bias", 3)

    vocab = meta.get("tokenizer.ggml.tokens", [])
    token_id = {tok: i for i, tok in enumerate(vocab)}
    return cfg, params, token_id


def init_random_params(cfg: ProstT5Config, seed: int = 0):
    """Random params with the real tree structure (for compile checks)."""
    rng = np.random.RandomState(seed)

    def r(*shape):
        return (rng.randn(*shape) * 0.02).astype(np.float32)

    params = {
        "embed": r(cfg.vocab_size, cfg.d_model),
        "final_norm": np.ones(cfg.d_model, np.float32),
        "rel_bias": r(cfg.rel_buckets, cfg.num_heads),
        "layers": [
            {
                "attn_norm": np.ones(cfg.d_model, np.float32),
                "wq": r(cfg.d_model, cfg.num_heads * cfg.d_kv),
                "wk": r(cfg.d_model, cfg.num_heads * cfg.d_kv),
                "wv": r(cfg.d_model, cfg.num_heads * cfg.d_kv),
                "wo": r(cfg.num_heads * cfg.d_kv, cfg.d_model),
                "ffn_norm": np.ones(cfg.d_model, np.float32),
                "ffn_up": r(cfg.d_model, cfg.d_ff),
                "ffn_down": r(cfg.d_ff, cfg.d_model),
            } for _ in range(cfg.num_layers)
        ],
        "conv0_w": r(cfg.conv_hidden, cfg.d_model, 1, 7),
        "conv0_b": r(cfg.conv_hidden),
        "conv3_w": r(cfg.n_states, cfg.conv_hidden, 1, 7),
        "conv3_b": r(cfg.n_states),
    }
    return params


# ---------------------------------------------------------------------------
# forward (pure jax)

def relative_position_bucket(rel_pos, num_buckets: int, max_distance: int):
    """T5 bidirectional bucketing (HF T5Attention._relative_position_bucket)."""
    import jax.numpy as jnp
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def encoder_forward(params, cfg: ProstT5Config, tokens, mask,
                    compute_dtype=None, head: bool = True):
    """tokens: int32 [B, T]; mask: bool [B, T]. Returns 3Di logits
    [B, T-1, 20] — logits[i] scores residue i (positions past L-1 invalid).
    With head=False returns the final encoder hidden states [B, T, d]."""
    import jax
    import jax.numpy as jnp
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16
    B, T = tokens.shape
    eps = cfg.layer_norm_eps

    x = jnp.asarray(params["embed"])[tokens].astype(compute_dtype)

    pos = jnp.arange(T)
    rel = pos[None, :] - pos[:, None]          # key pos - query pos
    buckets = relative_position_bucket(rel, cfg.rel_buckets, cfg.rel_max_distance)
    bias = jnp.asarray(params["rel_bias"])[buckets]        # [T, T, H]
    bias = jnp.transpose(bias, (2, 0, 1))[None]            # [1, H, T, T]
    neg = jnp.finfo(jnp.float32).min
    attn_mask = jnp.where(mask[:, None, None, :], 0.0, neg)  # [B,1,1,T]

    def rms(x, w):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        out = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
        return (out * w).astype(compute_dtype)

    for layer in params["layers"]:
        h = rms(x, layer["attn_norm"])
        q = (h @ jnp.asarray(layer["wq"], compute_dtype)).reshape(B, T, cfg.num_heads, cfg.d_kv)
        k = (h @ jnp.asarray(layer["wk"], compute_dtype)).reshape(B, T, cfg.num_heads, cfg.d_kv)
        v = (h @ jnp.asarray(layer["wv"], compute_dtype)).reshape(B, T, cfg.num_heads, cfg.d_kv)
        # T5: no 1/sqrt(d_kv) scaling
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + bias + attn_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(B, T, cfg.num_heads * cfg.d_kv).astype(compute_dtype)
        x = x + (ctx @ jnp.asarray(layer["wo"], compute_dtype)).astype(compute_dtype)

        h = rms(x, layer["ffn_norm"])
        if "ffn_gate" in layer:
            # flan-style gated GELU (llm_build_ffn GELU/PAR branch)
            up = (jax.nn.gelu(h @ jnp.asarray(layer["ffn_gate"], compute_dtype),
                              approximate=False)
                  * (h @ jnp.asarray(layer["ffn_up"], compute_dtype)))
        else:
            up = jax.nn.relu(h @ jnp.asarray(layer["ffn_up"], compute_dtype))
        x = x + (up @ jnp.asarray(layer["ffn_down"], compute_dtype)).astype(compute_dtype)

    x = rms(x, params["final_norm"]).astype(jnp.float32)
    if not head:
        return x

    # CNN head (llama.cpp:11230-11295): rows 1..T-2 then one zero row
    h = x[:, 1:-1, :]
    h = jnp.pad(h, ((0, 0), (0, 1), (0, 0)))
    # conv over tokens: kernel 7, pad 3; gguf conv0 [32, 1024, 1, 7]
    w0 = jnp.asarray(params["conv0_w"])[:, :, 0, :]        # [32, 1024, 7]
    w0 = jnp.transpose(w0, (2, 1, 0))                      # [7, 1024, 32]
    h = jax.lax.conv_general_dilated(
        h, w0, window_strides=(1,), padding=[(3, 3)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    h = jax.nn.relu(h + jnp.asarray(params["conv0_b"]))
    w3 = jnp.asarray(params["conv3_w"])[:, :, 0, :]
    w3 = jnp.transpose(w3, (2, 1, 0))                      # [7, 32, 20]
    h = jax.lax.conv_general_dilated(
        h, w3, window_strides=(1,), padding=[(3, 3)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return h + jnp.asarray(params["conv3_b"])


# ---------------------------------------------------------------------------
# predictor


class ProstT5:
    """Batched 3Di predictor with length bucketing.

    Mirrors the reference's long-sequence handling: sequences longer than
    `split_length` are predicted in overlapping windows
    (structcreatedb.cpp:845-861).
    """

    def __init__(self, model_file: Optional[str] = None,
                 cfg: Optional[ProstT5Config] = None,
                 params=None, token_id: Optional[Dict[str, int]] = None,
                 split_length: int = 1024):
        if model_file is not None:
            cfg, params, token_id = load_params_gguf(model_file)
            logger.info("ProstT5: loaded %s (%d layers, d_model %d, vocab %d)",
                        model_file, cfg.num_layers, cfg.d_model, cfg.vocab_size)
        assert cfg is not None and params is not None
        self.cfg = cfg
        self.params = params
        self.token_id = token_id or {}
        self.split_length = split_length
        self._jit = {}

    def _tok(self, name, default=0):
        return self.token_id.get(name, default)

    def tokenize(self, seq: str, pad_to: int) -> np.ndarray:
        prefix = self._tok("<AA2fold>", 3)
        eos = self._tok("</s>", 1)
        unk = self._tok("▁X", 2)
        toks = [prefix]
        for c in seq.upper():
            toks.append(self._tok("▁" + c, unk))
        toks.append(eos)
        out = np.zeros(pad_to, dtype=np.int32)
        out[:len(toks)] = toks
        return out

    def _forward(self, pad_to: int):
        if pad_to not in self._jit:
            import jax

            cfg = self.cfg

            @jax.jit
            def f(params, tokens, mask):
                return encoder_forward(params, cfg, tokens, mask)
            self._jit[pad_to] = f
        return self._jit[pad_to]

    def predict(self, seqs: List[str], batch_size: int = 8) -> List[str]:
        """3Di strings for a list of AA sequences."""
        out = [None] * len(seqs)
        order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
        for start in range(0, len(order), batch_size):
            idx = [i for i in order[start:start + batch_size]]
            max_t = max(len(seqs[i]) for i in idx) + 2
            pad_to = max(16, 1 << (max_t - 1).bit_length())
            toks = np.stack([self.tokenize(seqs[i], pad_to) for i in idx])
            mask = np.zeros_like(toks, dtype=bool)
            for row, i in enumerate(idx):
                mask[row, :len(seqs[i]) + 2] = True
            logits = np.asarray(self._forward(pad_to)(
                self.params, toks, mask))
            for row, i in enumerate(idx):
                L = len(seqs[i])
                states = logits[row, :L, :self.cfg.n_states].argmax(axis=-1)
                out[i] = "".join(THREE_DI[s] for s in states)
        return out
