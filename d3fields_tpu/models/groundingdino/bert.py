"""BERT text encoder in pure JAX (GroundingDINO's text trunk).

GroundingDINO feeds BERT a 3D per-caption self-attention mask and explicit
position ids (segments restart at 0 after every special token,
``modeling_grounding_dino.py::generate_masks_with_special_tokens_and_transfer_map``).
Weight format follows the huggingface ``BertModel`` state dict nested under
``model.text_backbone`` in a GroundingDino checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2


def _layer_norm(x, w, b, eps=1e-12):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def bert_encode(params: Dict, input_ids: Array, attention_mask_3d: Array,
                token_type_ids: Array, position_ids: Array,
                cfg: BertConfig) -> Array:
    """input_ids (B, L); attention_mask_3d (B, L, L) bool (True = attend).
    Returns last hidden state (B, L, D)."""
    emb = (
        params["word_emb"][input_ids]
        + params["pos_emb"][position_ids]
        + params["type_emb"][token_type_ids]
    )
    x = _layer_norm(emb, params["emb_ln_w"], params["emb_ln_b"])

    bias = jnp.where(attention_mask_3d[:, None], 0.0, -1e30)  # (B, 1, L, L)
    nh = cfg.num_heads
    B, L, D = x.shape
    hd = D // nh
    for lp in params["layers"]:
        def proj(name, t):
            v = t @ lp[name + "_w"] + lp[name + "_b"]
            return v.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = proj("q", x), proj("k", x), proj("v", x)
        logits = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd) + bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        att = (probs @ v).transpose(0, 2, 1, 3).reshape(B, L, D)
        att = att @ lp["o_w"] + lp["o_b"]
        x = _layer_norm(x + att, lp["att_ln_w"], lp["att_ln_b"])

        h = jax.nn.gelu(x @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        h = h @ lp["fc2_w"] + lp["fc2_b"]
        x = _layer_norm(x + h, lp["out_ln_w"], lp["out_ln_b"])
    return x


def convert_hf_bert(sd: Dict[str, np.ndarray], cfg: BertConfig,
                    prefix: str = "") -> Dict:
    g = lambda n: jnp.asarray(np.asarray(sd[prefix + n]))
    lin = lambda n: jnp.asarray(np.asarray(sd[prefix + n]).T)
    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        layers.append({
            "q_w": lin(pre + ".attention.self.query.weight"),
            "q_b": g(pre + ".attention.self.query.bias"),
            "k_w": lin(pre + ".attention.self.key.weight"),
            "k_b": g(pre + ".attention.self.key.bias"),
            "v_w": lin(pre + ".attention.self.value.weight"),
            "v_b": g(pre + ".attention.self.value.bias"),
            "o_w": lin(pre + ".attention.output.dense.weight"),
            "o_b": g(pre + ".attention.output.dense.bias"),
            "att_ln_w": g(pre + ".attention.output.LayerNorm.weight"),
            "att_ln_b": g(pre + ".attention.output.LayerNorm.bias"),
            "fc1_w": lin(pre + ".intermediate.dense.weight"),
            "fc1_b": g(pre + ".intermediate.dense.bias"),
            "fc2_w": lin(pre + ".output.dense.weight"),
            "fc2_b": g(pre + ".output.dense.bias"),
            "out_ln_w": g(pre + ".output.LayerNorm.weight"),
            "out_ln_b": g(pre + ".output.LayerNorm.bias"),
        })
    return {
        "word_emb": g("embeddings.word_embeddings.weight"),
        "pos_emb": g("embeddings.position_embeddings.weight"),
        "type_emb": g("embeddings.token_type_embeddings.weight"),
        "emb_ln_w": g("embeddings.LayerNorm.weight"),
        "emb_ln_b": g("embeddings.LayerNorm.bias"),
        "layers": layers,
    }
