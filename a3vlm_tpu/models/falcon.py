"""Falcon decoder (``llama_type="falcon"``, reference
model/accessory/model/LLM/falcon.py): text-only (image_words = 0, :302),
new-decoder architecture — parallel attention + MLP sharing the residual,
with separate ln_attn / ln_mlp LayerNorms (:228-276), GQA/multi-query
attention, GELU 4x MLP, and **half-split** rotary (falcon.py:47-57 pairs
x[i] with x[i + d/2], unlike LLaMA's interleaved pairs).

Same TPU-native structure as models/llama: scan-stacked layers, explicit KV
cache, sharding via PartitionSpecs."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from a3vlm_tpu.ops.attention import attention
from a3vlm_tpu.ops.decode_attention import (
    attend_decode_cache,
    update_decode_cache,
)
from a3vlm_tpu.ops.norms import layer_norm
from a3vlm_tpu.models.llama import _layer_getter, stack_layers
from a3vlm_tpu.ops.quant_matmul import qmat
from a3vlm_tpu.ops.rope import precompute_freqs_cis

Params = dict[str, Any]


@dataclass(frozen=True)
class FalconArgs:
    num_layers: int = 80
    hidden_size: int = 14848
    num_attention_heads: int = 232
    num_kv_heads: Optional[int] = 8
    bias: bool = False
    multi_query: bool = False
    new_decoder_architecture: bool = True
    parallel_attn: bool = True
    layer_norm_epsilon: float = 1e-5
    vocab_size: int = -1
    rope_theta: float = 10000.0
    max_batch_size: int = 32
    max_seq_len: int = 2048
    rope_scaling: Optional[float] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        if self.multi_query:
            return 1
        return self.num_kv_heads or self.num_attention_heads


def apply_rotary_half_split(x: jnp.ndarray, freqs_cis: jnp.ndarray):
    """Falcon rotary: pair (x[i], x[i + d/2]) (falcon.py:47-57)."""
    cos = freqs_cis[..., 0][None, :, None, :]
    sin = freqs_cis[..., 1][None, :, None, :]
    d2 = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :d2], xf[..., d2:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )
    return out.astype(x.dtype)


def init_falcon_params(
    key: jax.Array, args: FalconArgs, dtype=jnp.float32
) -> Params:
    D, L = args.hidden_size, args.num_layers
    H, Hkv, hd = args.num_attention_heads, args.kv_heads, args.head_dim
    init = jax.nn.initializers.truncated_normal(0.02)
    import numpy as _np

    keys = jax.random.split(key, 16)
    # host-side key table avoids per-key relay round trips;
    # stays traced under eval_shape (shape-only fabrication)
    keys = iter(keys if isinstance(keys, jax.core.Tracer)
                else _np.asarray(keys))

    def lin(shape):
        k = next(keys)
        return jnp.stack(
            [init(kk, shape, dtype) for kk in jax.random.split(k, L)]
        )

    def ln_l():
        return {
            "weight": jnp.ones((L, D), dtype),
            "bias": jnp.zeros((L, D), dtype),
        }

    return {
        "word_embeddings": {"weight": init(next(keys), (args.vocab_size, D), dtype)},
        "layers": {
            "attention": {
                "wq": {"weight": lin((D, H * hd))},
                "wk": {"weight": lin((D, Hkv * hd))},
                "wv": {"weight": lin((D, Hkv * hd))},
                "wo": {"weight": lin((H * hd, D))},
            },
            "mlp": {
                "dense_h_to_4h": {"weight": lin((D, 4 * D))},
                "dense_4h_to_h": {"weight": lin((4 * D, D))},
            },
            "ln_attn": ln_l(),
            "ln_mlp": ln_l(),
        },
        "ln_f": {"weight": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "output": {"weight": init(next(keys), (D, args.vocab_size), dtype)},
    }


def falcon_partition_specs(args: FalconArgs) -> Params:
    col = P(None, None, "model")
    row = P(None, "model", None)
    ln = {"weight": P(None, None), "bias": P(None, None)}
    return {
        "word_embeddings": {"weight": P(None, "model")},
        "layers": {
            "attention": {
                "wq": {"weight": col},
                "wk": {"weight": col},
                "wv": {"weight": col},
                "wo": {"weight": row},
            },
            "mlp": {
                "dense_h_to_4h": {"weight": col},
                "dense_4h_to_h": {"weight": row},
            },
            "ln_attn": ln,
            "ln_mlp": ln,
        },
        "ln_f": {"weight": P(None), "bias": P(None)},
        "output": {"weight": P(None, "model")},
    }


class FalconKVCache(NamedTuple):
    """Stacked [L, B, S, Hkv, hd] arrays or per-layer tuples (layered=True,
    the in-place decode layout — see models/llama.KVCache)."""

    k: jnp.ndarray | tuple
    v: jnp.ndarray | tuple

    @classmethod
    def create(cls, args: FalconArgs, batch, max_seq_len=None,
               dtype=jnp.bfloat16, layered: bool = False):
        S = max_seq_len or args.max_seq_len
        # sublane-align (llama.KVCache note: keeps the decode-attention
        # kernel eligible for arbitrary lengths; kv_valid_len masks padding)
        S = -(-S // 8) * 8
        if dtype == jnp.int8 and not layered:
            raise ValueError(
                "int8 KV caches require layered=True (llama.KVCache note)"
            )
        if layered and dtype == jnp.int8:
            from a3vlm_tpu.ops.decode_attention import make_quantized_kv

            def make():
                return make_quantized_kv(
                    batch, args.kv_heads, S, args.head_dim
                )

            return cls(
                tuple(make() for _ in range(args.num_layers)),
                tuple(make() for _ in range(args.num_layers)),
            )
        if layered:
            # [B, Hkv, S, D]: panel-contiguous decode layout (llama.KVCache)
            shape = (batch, args.kv_heads, S, args.head_dim)
            return cls(
                tuple(jnp.zeros(shape, dtype) for _ in range(args.num_layers)),
                tuple(jnp.zeros(shape, dtype) for _ in range(args.num_layers)),
            )
        full = (args.num_layers, batch, S, args.kv_heads, args.head_dim)
        return cls(jnp.zeros(full, dtype), jnp.zeros(full, dtype))

    @property
    def layered(self) -> bool:
        return isinstance(self.k, tuple)


def _block(h, lp, args: FalconArgs, freqs_cis, mask, cache_k, cache_v,
           write_pos, kv_valid_len, attend_cache, cache_layout="bshd"):
    B, S, D = h.shape
    H, Hkv, hd = args.num_attention_heads, args.kv_heads, args.head_dim
    eps = args.layer_norm_epsilon

    attn_in = layer_norm(h, lp["ln_attn"]["weight"], lp["ln_attn"]["bias"], eps)
    mlp_in = layer_norm(h, lp["ln_mlp"]["weight"], lp["ln_mlp"]["bias"], eps)

    att = lp["attention"]
    xq = qmat(attn_in, att["wq"]["weight"]).reshape(B, S, H, hd)
    xk = qmat(attn_in, att["wk"]["weight"]).reshape(B, S, Hkv, hd)
    xv = qmat(attn_in, att["wv"]["weight"]).reshape(B, S, Hkv, hd)
    xq = apply_rotary_half_split(xq, freqs_cis)
    xk = apply_rotary_half_split(xk, freqs_cis)

    if cache_k is not None:
        cache_k, cache_v = update_decode_cache(
            cache_k, cache_v, xk, xv, write_pos, layout=cache_layout
        )
    if cache_k is not None and attend_cache:
        attn_out = attend_decode_cache(
            xq, cache_k, cache_v, mask=mask, kv_valid_len=kv_valid_len,
            layout=cache_layout,
        )
    else:
        attn_out = attention(xq, xk, xv, mask=mask, kv_valid_len=None)
    attn_out = qmat(attn_out.reshape(B, S, H * hd), att["wo"]["weight"])

    mlp = lp["mlp"]
    mlp_out = jax.nn.gelu(
        qmat(mlp_in, mlp["dense_h_to_4h"]["weight"]), approximate=False
    )
    mlp_out = qmat(mlp_out, mlp["dense_4h_to_h"]["weight"])

    # parallel attn + mlp share the residual (falcon.py:268-276)
    return h + attn_out + mlp_out, (cache_k, cache_v)


def _freqs(args: FalconArgs, positions):
    table = precompute_freqs_cis(
        args.head_dim, args.max_seq_len * 2, theta=args.rope_theta,
        scaling=args.rope_scaling,
    )
    return table[positions]


def forward_train(params: Params, args: FalconArgs, examples: jnp.ndarray,
                  remat: bool = False, impl: str = "auto") -> jnp.ndarray:
    h = jnp.take(params["word_embeddings"]["weight"], examples, axis=0)
    freqs_cis = _freqs(args, jnp.arange(h.shape[1]))

    def body(hc, lp):
        out, _ = _block(
            hc, lp, args, freqs_cis, "causal", None, None, 0, None, True
        )
        return out, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    h, _ = jax.lax.scan(body, h, stack_layers(params["layers"]))
    h = layer_norm(
        h, params["ln_f"]["weight"], params["ln_f"]["bias"],
        args.layer_norm_epsilon,
    )
    return qmat(h, params["output"]["weight"])




def _run_layers_cached(params, args, h, freqs_cis, mask, cache, write_pos,
                       kv_valid_len, attend_cache):
    if cache.layered:
        # per-layer (tuple-form) weights stream without the per-step slice
        # copies (llama.unstack_layers docstring)
        layer = _layer_getter(params["layers"])
        new_k, new_v = [], []
        for i in range(args.num_layers):
            h, (k_new, v_new) = _block(
                h, layer(i), args, freqs_cis, mask, cache.k[i], cache.v[i],
                write_pos, kv_valid_len, attend_cache, cache_layout="bhsd",
            )
            new_k.append(k_new)
            new_v.append(v_new)
        return h, FalconKVCache(tuple(new_k), tuple(new_v))

    def body(hc, xs):
        lp, k_l, v_l = xs
        out, (k, v) = _block(hc, lp, args, freqs_cis, mask, k_l, v_l,
                             write_pos, kv_valid_len, attend_cache)
        return out, (k, v)

    h, (k, v) = jax.lax.scan(
        body, h, (stack_layers(params["layers"]), cache.k, cache.v)
    )
    return h, FalconKVCache(k, v)


def prefill(params, args: FalconArgs, cache: FalconKVCache, tokens):
    h = jnp.take(params["word_embeddings"]["weight"], tokens, axis=0)
    S = h.shape[1]
    freqs_cis = _freqs(args, jnp.arange(S))
    h, cache = _run_layers_cached(
        params, args, h, freqs_cis, "causal", cache, 0, None, False
    )
    h = layer_norm(
        h, params["ln_f"]["weight"], params["ln_f"]["bias"],
        args.layer_norm_epsilon,
    )
    logits = qmat(h[:, -1, :], params["output"]["weight"])
    return logits.astype(jnp.float32), cache, S


def decode_step(params, args: FalconArgs, cache: FalconKVCache, token,
                seq_pos):
    B = token.shape[0]
    seq_pos = jnp.asarray(seq_pos, jnp.int32)
    h = jnp.take(params["word_embeddings"]["weight"], token, axis=0)
    freqs_cis = _freqs(args, seq_pos[None])
    kv_valid = jnp.full((B,), seq_pos + 1, jnp.int32)
    h, cache = _run_layers_cached(
        params, args, h, freqs_cis, None, cache, seq_pos, kv_valid, True
    )
    h = layer_norm(
        h, params["ln_f"]["weight"], params["ln_f"]["bias"],
        args.layer_norm_epsilon,
    )
    logits = qmat(h[:, -1, :], params["output"]["weight"])
    return logits.astype(jnp.float32), cache
