"""BLIP-2 Q-Former — the 32-query visual abstractor of the A3VLM ensemble
(reference llama_ens5.py:284-293, 400-403: ``qformer.get_qformer_features``
-> [B, 32, 768], projected by ``qformer_proj``).

BERT-style post-LN encoder over 32 learned query tokens:
- self-attention among queries,
- cross-attention to the frozen EVA-ViT image features every
  ``cross_attention_frequency`` layers,
- GELU FFN (the query-specific intermediate/output path).

The language model / language projection of BLIP-2 are dropped, exactly as
the reference does (llama_ens5.py:291-292).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from a3vlm_tpu.ops.attention import attention
from a3vlm_tpu.ops.norms import layer_norm

Params = dict[str, Any]


@dataclass(frozen=True)
class QFormerConfig:
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    num_queries: int = 32
    cross_attention_frequency: int = 2
    encoder_width: int = 1408  # EVA ViT-g feature dim
    norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


BLIP2_QFORMER = QFormerConfig()


def _dense(key, shape, dtype):
    return {
        "weight": jax.nn.initializers.truncated_normal(0.02)(key, shape, dtype),
        "bias": jnp.zeros((shape[-1],), dtype),
    }


def init_qformer_params(
    key: jax.Array, cfg: QFormerConfig, dtype=jnp.float32
) -> Params:
    import numpy as _np

    keys = jax.random.split(key, 1024)
    # host-side key table avoids per-key relay round trips;
    # stays traced under eval_shape (shape-only fabrication)
    keys = iter(keys if isinstance(keys, jax.core.Tracer)
                else _np.asarray(keys))
    H, E = cfg.hidden, cfg.encoder_width

    def ln():
        return {"weight": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)}

    layers = []
    for i in range(cfg.layers):
        lp: Params = {
            "self_attn": {
                "q": _dense(next(keys), (H, H), dtype),
                "k": _dense(next(keys), (H, H), dtype),
                "v": _dense(next(keys), (H, H), dtype),
                "out": _dense(next(keys), (H, H), dtype),
                "ln": ln(),
            },
            "ffn": {
                "fc1": _dense(next(keys), (H, cfg.intermediate), dtype),
                "fc2": _dense(next(keys), (cfg.intermediate, H), dtype),
                "ln": ln(),
            },
        }
        if i % cfg.cross_attention_frequency == 0:
            lp["cross_attn"] = {
                "q": _dense(next(keys), (H, H), dtype),
                "k": _dense(next(keys), (E, H), dtype),
                "v": _dense(next(keys), (E, H), dtype),
                "out": _dense(next(keys), (H, H), dtype),
                "ln": ln(),
            }
        layers.append(lp)

    return {
        "query_tokens": jax.nn.initializers.truncated_normal(0.02)(
            next(keys), (cfg.num_queries, H), dtype
        ),
        "layernorm": ln(),
        "layers": layers,
    }


def _mha(x_q, x_kv, ap, heads, head_dim, eps):
    B, Sq, _ = x_q.shape
    Skv = x_kv.shape[1]
    q = (x_q @ ap["q"]["weight"] + ap["q"]["bias"]).reshape(B, Sq, heads, head_dim)
    k = (x_kv @ ap["k"]["weight"] + ap["k"]["bias"]).reshape(B, Skv, heads, head_dim)
    v = (x_kv @ ap["v"]["weight"] + ap["v"]["bias"]).reshape(B, Skv, heads, head_dim)
    out = attention(q, k, v, mask=None).reshape(B, Sq, heads * head_dim)
    out = out @ ap["out"]["weight"] + ap["out"]["bias"]
    # BERT post-LN: LN(residual + sublayer)
    return layer_norm(x_q + out, ap["ln"]["weight"], ap["ln"]["bias"], eps)


def qformer_forward(
    params: Params,
    cfg: QFormerConfig,
    image_feats: jnp.ndarray,  # [B, S_img, encoder_width]
) -> jnp.ndarray:
    """Returns query features [B, num_queries, hidden]."""
    B = image_feats.shape[0]
    x = jnp.broadcast_to(
        params["query_tokens"][None], (B, cfg.num_queries, cfg.hidden)
    ).astype(image_feats.dtype)
    x = layer_norm(
        x, params["layernorm"]["weight"], params["layernorm"]["bias"], cfg.norm_eps
    )
    for lp in params["layers"]:
        x = _mha(x, x, lp["self_attn"], cfg.heads, cfg.head_dim, cfg.norm_eps)
        if "cross_attn" in lp:
            x = _mha(
                x, image_feats, lp["cross_attn"], cfg.heads, cfg.head_dim,
                cfg.norm_eps,
            )
        h = x @ lp["ffn"]["fc1"]["weight"] + lp["ffn"]["fc1"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ lp["ffn"]["fc2"]["weight"] + lp["ffn"]["fc2"]["bias"]
        x = layer_norm(
            x + h, lp["ffn"]["ln"]["weight"], lp["ffn"]["ln"]["bias"], cfg.norm_eps
        )
    return x
