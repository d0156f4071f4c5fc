"""LLaMA-2 decoder, TPU-native.

Functional rebuild of the reference decoder (model/accessory/model/LLM/
llama_ens5.py:53-282) plus the upstream RoPE/GQA helpers it imports but does
not vendor. Design differences from the torch original, all deliberate:

- parameters are a pytree with the 40 layers **stacked** on a leading axis and
  the layer loop expressed as ``lax.scan`` — one compiled block body instead
  of 40 unrolled ones (fast compile, identical math).
- tensor parallelism is NamedSharding on the weight dims (fairscale
  Column/RowParallelLinear at llama_ens5.py:63-90,202-210 become
  PartitionSpecs; XLA inserts the ICI collectives).
- the KV cache is an explicit, donated array pair, written with
  ``lax.dynamic_update_slice`` at a traced position — the functional analogue
  of llama_ens5.py:121-129's in-place cache.
- linear weights are stored [in, out] (x @ w); importers transpose from
  torch's [out, in].

Mask semantics and cache-position bookkeeping follow the reference contracts
exactly (see ops/attention.py and ``image_words`` handling in models/ens5).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.ops.attention import attention
from a3vlm_tpu.ops.decode_attention import (
    update_and_attend_decode_cache,
    update_decode_cache,
)
from a3vlm_tpu.ops.norms import rms_norm
from a3vlm_tpu.ops.quant_matmul import int4_ffn_down, qmat
from a3vlm_tpu.ops.rope import apply_rotary_emb, precompute_freqs_cis
from a3vlm_tpu.quant import QuantizedWeight

Params = dict[str, Any]

# Route int4 decode FFN tails through the GLU-fused kernel (silu(g)*u and
# the residual folded into the w2 matmul — see ops/quant_matmul.py
# int4_ffn_down). Default OFF: a 3-pair interleaved on-chip A/B
# (scripts/ffn_fuse_ab.py, 7B int4 batch 16 full-depth) measured the
# fusion a stable -0.8% (1410-1412 vs 1421-1423 tok/s) — removing the
# silu-mul + residual XLA islands does NOT reduce the ~2.8 ms/step
# inter-op glue, which localizes the glue to launch/relayout around the
# custom calls rather than the islands' own execution. Kept as a sweep
# knob + documented negative result.
FUSE_FFN_DOWN = False


class KVCache(NamedTuple):
    """Either stacked arrays [n_layers, batch, max_seq, n_kv_heads, head_dim]
    (training/prefill-friendly, used with the layer scan) or — for decode —
    TUPLES of per-layer [batch, n_kv_heads, max_seq, head_dim] buffers.

    The layered form exists for speed: per-layer buffers let XLA perform the
    per-step ``dynamic_update_slice`` in place, while a stacked cache flowing
    through ``lax.scan`` ys is copied wholesale every step (measured 4.6 ->
    2.0 ms/step on v5e for an 8-layer 1024-dim model with a 1551-slot
    cache). Layered buffers are [B, Hkv, S, D] — the panel-contiguous layout
    the Pallas decode-attention kernel reads (ops/decode_attention.py)."""

    k: jnp.ndarray | tuple
    v: jnp.ndarray | tuple

    @classmethod
    def create(
        cls, args: ModelArgs, batch_size: int, max_seq_len: int | None = None,
        dtype=jnp.bfloat16, layered: bool = False,
    ) -> "KVCache":
        S = max_seq_len or args.max_seq_len
        # sublane-align the cache length: costs <=7 masked slots, keeps the
        # Pallas decode-attention kernel eligible (it wants S % 8 == 0) for
        # arbitrary prompt lengths; kv_valid_len masks the padding
        S = -(-S // 8) * 8
        if dtype == jnp.int8 and not layered:
            raise ValueError(
                "int8 KV caches require layered=True (QuantizedKV buffers; "
                "the stacked/scan cache has no scale plane)"
            )
        if layered:
            if dtype == jnp.int8:
                # int8 KV cache (serving extension): per-token scales;
                # update/attend handled by ops.decode_attention helpers
                from a3vlm_tpu.ops.decode_attention import make_quantized_kv

                def make():
                    return make_quantized_kv(
                        batch_size, args.kv_heads, S, args.head_dim
                    )

                return cls(
                    tuple(make() for _ in range(args.n_layers)),
                    tuple(make() for _ in range(args.n_layers)),
                )
            shape = (batch_size, args.kv_heads, S, args.head_dim)
            return cls(
                tuple(jnp.zeros(shape, dtype) for _ in range(args.n_layers)),
                tuple(jnp.zeros(shape, dtype) for _ in range(args.n_layers)),
            )
        full = (args.n_layers, batch_size, S, args.kv_heads, args.head_dim)
        return cls(jnp.zeros(full, dtype), jnp.zeros(full, dtype))

    @property
    def layered(self) -> bool:
        return isinstance(self.k, tuple)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, dtype, fan_in):
    # matches the reference's default_linear_init (llama_ens5.py:28):
    # kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_llama_params(key: jax.Array, args: ModelArgs, dtype=jnp.float32) -> Params:
    D, V, L = args.dim, args.vocab_size, args.n_layers
    H, Hkv, hd = args.n_heads, args.kv_heads, args.head_dim
    F = args.ffn_hidden_dim
    keys = jax.random.split(key, 10)

    def lin(k, fan_in, shape):
        # one leading layer axis; independent per-layer init
        ks = jax.random.split(k, L)
        return jnp.stack(
            [_kaiming_uniform(ks[i], shape, dtype, fan_in) for i in range(L)]
        )

    return {
        "tok_embeddings": {
            "weight": _kaiming_uniform(keys[0], (V, D), dtype, D),
        },
        "layers": {
            "attention": {
                "wq": {"weight": lin(keys[1], D, (D, H * hd))},
                "wk": {"weight": lin(keys[2], D, (D, Hkv * hd))},
                "wv": {"weight": lin(keys[3], D, (D, Hkv * hd))},
                "wo": {"weight": lin(keys[4], H * hd, (H * hd, D))},
            },
            "feed_forward": {
                "w1": {"weight": lin(keys[5], D, (D, F))},
                "w2": {"weight": lin(keys[6], F, (F, D))},
                "w3": {"weight": lin(keys[7], D, (D, F))},
            },
            "attention_norm": {"weight": jnp.ones((L, D), dtype)},
            "ffn_norm": {"weight": jnp.ones((L, D), dtype)},
        },
        "norm": {"weight": jnp.ones((D,), dtype)},
        "output": {"weight": _kaiming_uniform(keys[8], (D, V), dtype, D)},
    }


def llama_partition_specs(args: ModelArgs) -> Params:
    """Tensor-parallel PartitionSpecs mirroring the fairscale splits:
    wq/wk/wv/w1/w3 column-parallel (output dim on "model"), wo/w2
    row-parallel (input dim on "model"), embedding dim-sharded
    (ParallelEmbedding), lm head column-parallel (llama_ens5.py:63-90,
    202-210, 258-268)."""
    col = P(None, None, "model")  # [L, in, out] shard out
    row = P(None, "model", None)  # [L, in, out] shard in
    rep = P(None, None)
    return {
        "tok_embeddings": {"weight": P(None, "model")},
        "layers": {
            "attention": {
                "wq": {"weight": col},
                "wk": {"weight": col},
                "wv": {"weight": col},
                "wo": {"weight": row},
            },
            "feed_forward": {
                "w1": {"weight": col},
                "w2": {"weight": row},
                "w3": {"weight": col},
            },
            "attention_norm": {"weight": rep},
            "ffn_norm": {"weight": rep},
        },
        "norm": {"weight": P(None)},
        "output": {"weight": P(None, "model")},
    }


def kv_cache_partition_spec() -> KVCache:
    s = P(None, "data", None, "model", None)
    return KVCache(s, s)


def decode_cache_specs(
    args: ModelArgs, mesh, batch: int, quant: bool = False
) -> KVCache:
    """PartitionSpecs for a *layered* decode cache on ``mesh``: batch over
    "data", KV heads over "model" (the serving layout — the reference serves
    with the cache split per TP rank, llama_ens5.py:121-129 under MP=2,
    scripts/a3vlm_infer.sh:36-43). Axes that don't divide stay unsharded.
    Layered buffers are [B, Hkv, S, D]; ``quant`` emits matching
    QuantizedKV spec nodes (int8 panels + [B, Hkv, S] scales)."""
    axes = dict(mesh.shape)
    b_ax = "data" if batch % axes.get("data", 1) == 0 else None
    h_ax = "model" if args.kv_heads % axes.get("model", 1) == 0 else None
    spec = P(b_ax, h_ax, None, None)
    if quant:
        from a3vlm_tpu.ops.decode_attention import quantized_kv_spec

        spec = quantized_kv_spec(b_ax, h_ax)
    per_layer = tuple(spec for _ in range(args.n_layers))
    return KVCache(per_layer, per_layer)


# ---------------------------------------------------------------------------
# layer stacking
# ---------------------------------------------------------------------------


def unstack_layers(params: Params) -> Params:
    """Per-layer tuple form of a stacked param tree — the DECODE layout.

    The layered decode path must not slice stacked [L, ...] weights inside
    the token loop: XLA cannot fuse a slice into a dot/custom-call operand,
    so every weight would be *copied* every decode step (measured: the copy
    traffic, not the weights, dominated full-depth decode). Pre-sliced
    per-layer buffers stream weights at full HBM rate. One-time cost; the
    scan-based training path re-stacks via ``stack_layers``."""
    layers = params.get("layers")
    if layers is None or isinstance(layers, (list, tuple)):
        return params
    L = jax.tree_util.tree_leaves(layers)[0].shape[0]
    out = dict(params)
    out["layers"] = tuple(
        jax.tree_util.tree_map(lambda x: x[i], layers) for i in range(L)
    )
    return out


def stack_layers(layers) -> Any:
    """Inverse of ``unstack_layers`` for the ``lax.scan`` training path."""
    if not isinstance(layers, (list, tuple)):
        return layers
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _layer_getter(layers):
    if isinstance(layers, (list, tuple)):
        return lambda i: layers[i]
    return lambda i: jax.tree_util.tree_map(lambda x: x[i], layers)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def embed_tokens(params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0)


def _attention_sublayer(
    x: jnp.ndarray,
    lp: Params,
    args: ModelArgs,
    freqs_cis: jnp.ndarray,
    mask,
    cache_k: Optional[jnp.ndarray],
    cache_v: Optional[jnp.ndarray],
    write_pos,
    kv_valid_len,
    impl: str,
    attend_cache: bool = True,
    cache_layout: str = "bshd",
    attend_valid_static=None,
):
    B, S, _ = x.shape
    H, Hkv, hd = args.n_heads, args.kv_heads, args.head_dim

    xq = qmat(x, lp["wq"]["weight"]).reshape(B, S, H, hd)
    xk = qmat(x, lp["wk"]["weight"]).reshape(B, S, Hkv, hd)
    xv = qmat(x, lp["wv"]["weight"]).reshape(B, S, Hkv, hd)
    xq, xk = apply_rotary_emb(xq, xk, freqs_cis)

    if cache_k is not None and attend_cache:
        # single custom call on the decode hot path: writes this token's
        # k/v into the cache AND attends (falls back to the two-step
        # update+attend for prefill chunks / multi-token windows / CPU)
        out, (cache_k, cache_v) = update_and_attend_decode_cache(
            xq, cache_k, cache_v, xk, xv, write_pos, kv_valid_len,
            mask=mask, impl=impl, layout=cache_layout,
            valid_static=attend_valid_static,
        )
        out = qmat(out.reshape(B, S, H * hd), lp["wo"]["weight"])
        return out, (cache_k, cache_v)
    if cache_k is not None:
        cache_k, cache_v = update_decode_cache(
            cache_k, cache_v, xk, xv, write_pos, layout=cache_layout
        )
    # prefill: this call's k/v ARE the whole visible history — attend
    # over them directly (flash-kernel eligible) instead of the padded
    # cache
    keys, values = xk, xv
    kv_valid_len = None

    out = attention(
        xq, keys, values, mask=mask, kv_valid_len=kv_valid_len, impl=impl
    )
    out = qmat(out.reshape(B, S, H * hd), lp["wo"]["weight"])
    return out, (cache_k, cache_v)


def _ffn_sublayer(x: jnp.ndarray, lp: Params) -> jnp.ndarray:
    gate = qmat(x, lp["w1"]["weight"])
    up = qmat(x, lp["w3"]["weight"])
    return qmat(jax.nn.silu(gate) * up, lp["w2"]["weight"])


def _block(
    h: jnp.ndarray,
    lp: Params,
    args: ModelArgs,
    freqs_cis: jnp.ndarray,
    mask,
    cache_k,
    cache_v,
    write_pos,
    kv_valid_len,
    impl: str,
    attend_cache: bool = True,
    cache_layout: str = "bshd",
    attend_valid_static=None,
):
    attn_out, new_cache = _attention_sublayer(
        rms_norm(h, lp["attention_norm"]["weight"], args.norm_eps),
        lp["attention"],
        args,
        freqs_cis,
        mask,
        cache_k,
        cache_v,
        write_pos,
        kv_valid_len,
        impl,
        attend_cache=attend_cache,
        cache_layout=cache_layout,
        attend_valid_static=attend_valid_static,
    )
    h = h + attn_out
    ffn_in = rms_norm(h, lp["ffn_norm"]["weight"], args.norm_eps)
    fw = lp["feed_forward"]
    w2 = fw["w2"]["weight"]
    if (FUSE_FFN_DOWN and cache_k is not None
            and type(w2) is QuantizedWeight and w2.bits == 4):
        # int4 GLU-fused decode FFN tail (see FUSE_FFN_DOWN above for why
        # this defaults off). Training (no cache) keeps the unfused ops
        # (qmat's custom VJP).
        g = qmat(ffn_in, fw["w1"]["weight"])
        u = qmat(ffn_in, fw["w3"]["weight"])
        h = int4_ffn_down(g, u, w2, h)
    else:
        h = h + _ffn_sublayer(ffn_in, fw)
    return h, new_cache


def freqs_for_positions(args: ModelArgs, positions: jnp.ndarray) -> jnp.ndarray:
    """RoPE table rows for given absolute positions [S] -> [S, hd//2, 2].

    Table length matches the reference's ``max_seq_len * 2``
    (llama_ens5.py:271-274)."""
    table = precompute_freqs_cis(
        args.head_dim,
        args.max_seq_len * 2,
        theta=args.rope_theta,
        scaling=args.rope_scaling,
    )
    return table[positions]


def forward_hidden(
    params: Params,
    args: ModelArgs,
    h: jnp.ndarray,
    positions: jnp.ndarray,
    mask,
    cache: Optional[KVCache] = None,
    write_pos: int | jnp.ndarray = 0,
    kv_valid_len: Optional[jnp.ndarray] = None,
    remat: bool = False,
    impl: str = "auto",
    attend_cache: bool = True,
    attend_valid_static=None,
):
    """Run all decoder blocks on embeddings ``h`` [B, S, D].

    ``positions``: absolute sequence positions [S] for RoPE.
    With ``cache``, k/v of this call are written at ``write_pos``; attention
    runs over the cache prefix ``kv_valid_len`` when ``attend_cache``, else
    over this call's own k/v (prefill).
    Returns (h_out, new_cache | None).
    """
    freqs_cis = freqs_for_positions(args, positions)

    if cache is None:

        def body(hc, lp):
            out, _ = _block(
                hc, lp, args, freqs_cis, mask, None, None, 0, None, impl
            )
            return out, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        h, _ = jax.lax.scan(body, h, stack_layers(params["layers"]))
        return h, None

    if cache.layered:
        # unrolled layer loop over per-layer buffers: XLA updates each
        # cache slot in place (the decode hot path). Per-layer (tuple-form)
        # weights stream directly from HBM; stacked weights are sliced here
        # (acceptable for one-shot prefill, but decode loops should pass
        # ``unstack_layers``-form params — see its docstring).
        layer = _layer_getter(params["layers"])
        new_k, new_v = [], []
        for i in range(args.n_layers):
            h, (k_new, v_new) = _block(
                h, layer(i), args, freqs_cis, mask, cache.k[i], cache.v[i],
                write_pos, kv_valid_len, impl, attend_cache=attend_cache,
                cache_layout="bhsd",
                attend_valid_static=attend_valid_static,
            )
            new_k.append(k_new)
            new_v.append(v_new)
        return h, KVCache(tuple(new_k), tuple(new_v))

    def body_cache(hc, xs):
        lp, k_l, v_l = xs
        out, (k_new, v_new) = _block(
            hc, lp, args, freqs_cis, mask, k_l, v_l, write_pos, kv_valid_len,
            impl, attend_cache=attend_cache,
        )
        return out, (k_new, v_new)

    h, (k, v) = jax.lax.scan(
        body_cache, h, (stack_layers(params["layers"]), cache.k, cache.v)
    )
    return h, KVCache(k, v)


def forward_train(
    params: Params,
    args: ModelArgs,
    examples: jnp.ndarray,
    image_tokens: Optional[jnp.ndarray] = None,
    remat: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Training forward (llama_ens5.py:461-487): embeds tokens, splices image
    tokens between BOS and text, runs causal blocks, and returns logits **for
    text positions only** ([B, seq_text, vocab])."""
    B, _ = examples.shape
    h = embed_tokens(params, examples)
    image_words = 0
    if image_tokens is not None:
        image_words = image_tokens.shape[1]
        h = jnp.concatenate(
            [h[:, :1], image_tokens.astype(h.dtype), h[:, 1:]], axis=1
        )
    S = h.shape[1]
    positions = jnp.arange(S)
    h, _ = forward_hidden(
        params, args, h, positions, "causal", remat=remat, impl=impl
    )
    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    return qmat(h[:, image_words:, :], params["output"]["weight"])


def prefill(
    params: Params,
    args: ModelArgs,
    cache: KVCache,
    tokens: jnp.ndarray,
    image_tokens: Optional[jnp.ndarray] = None,
    impl: str = "auto",
):
    """Inference prefill (llama_ens5.py:490-512): runs the prompt (with image
    tokens spliced after BOS), writes the KV cache at positions [0, S), and
    returns (last-token logits [B, V], cache, seq_len).

    The cache holds the *full* spliced sequence, so later decode positions are
    ``token_index + image_words`` — the reference's ``cache_image_words``
    offset (llama_ens5.py:513-521)."""
    h = embed_tokens(params, tokens)
    if image_tokens is not None:
        h = jnp.concatenate(
            [h[:, :1], image_tokens.astype(h.dtype), h[:, 1:]], axis=1
        )
    S = h.shape[1]
    positions = jnp.arange(S)
    h, cache = forward_hidden(
        params,
        args,
        h,
        positions,
        "causal",
        cache=cache,
        write_pos=0,
        attend_cache=False,
        impl=impl,
    )
    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    logits = qmat(h[:, -1, :], params["output"]["weight"])
    return logits.astype(jnp.float32), cache, S


def prefill_chunked(
    params: Params,
    args: ModelArgs,
    cache: KVCache,
    tokens: jnp.ndarray,
    image_tokens: Optional[jnp.ndarray] = None,
    chunk: int = 512,
    impl: str = "auto",
):
    """Memory-bounded prefill: the spliced sequence is processed in
    ``chunk``-token pieces, each writing the cache and attending over the
    populated prefix (right-aligned causal). Activation temps are O(chunk)
    instead of O(sequence) — a one-shot unrolled prefill at batch 16 /
    1856 tokens needs ~24 GB of layer temps and OOMs the chip. Chunk
    starts are STATIC, so on TPU the cache attention routes through the
    flash kernel (attend_decode_cache valid_static). Same return contract
    as ``prefill``."""
    h = embed_tokens(params, tokens)
    if image_tokens is not None:
        h = jnp.concatenate(
            [h[:, :1], image_tokens.astype(h.dtype), h[:, 1:]], axis=1
        )
    B, S, _ = h.shape
    starts = list(range(0, S, chunk))
    for start in starts:
        end = min(start + chunk, S)
        piece = h[:, start:end]
        positions = jnp.arange(start, end)
        out, cache = forward_hidden(
            params,
            args,
            piece,
            positions,
            "causal",
            cache=cache,
            write_pos=start,
            kv_valid_len=jnp.full((B,), end, jnp.int32),
            attend_cache=True,
            impl=impl,
            attend_valid_static=end,
        )
    h_last = out[:, -1, :]
    h_last = rms_norm(h_last, params["norm"]["weight"], args.norm_eps)
    logits = qmat(h_last, params["output"]["weight"])
    return logits.astype(jnp.float32), cache, S


def decode_step(
    params: Params,
    args: ModelArgs,
    cache: KVCache,
    token: jnp.ndarray,
    seq_pos: jnp.ndarray,
    impl: str = "auto",
):
    """One-token decode (llama_ens5.py:513-531). ``token``: [B, 1];
    ``seq_pos``: scalar absolute position in the spliced sequence (i.e.
    token_index + image_words). Returns ([B, V] float32 logits, cache)."""
    B = token.shape[0]
    seq_pos = jnp.asarray(seq_pos, jnp.int32)
    h = embed_tokens(params, token)
    kv_valid = jnp.full((B,), seq_pos + 1, jnp.int32)
    h, cache = forward_hidden(
        params,
        args,
        h,
        seq_pos[None],
        None,
        cache=cache,
        write_pos=seq_pos,
        kv_valid_len=kv_valid,
        impl=impl,
    )
    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    logits = qmat(h[:, -1, :], params["output"]["weight"])
    return logits.astype(jnp.float32), cache


def decode_step_ragged(
    params: Params,
    args: ModelArgs,
    cache: KVCache,
    token: jnp.ndarray,
    seq_pos: jnp.ndarray,
    impl: str = "auto",
):
    """One-token decode with PER-SLOT positions — the continuous-batching
    step (no reference analogue; the torch server decodes lockstep batches
    only, multi_gpu_wrapper.py:260-320). ``token``: [B, 1]; ``seq_pos``:
    [B] — slot b's token sits at absolute position seq_pos[b], its cache
    row is written there, and its attention covers [0, seq_pos[b]]
    (per-row valid lengths are native to both the decode-attention kernel
    and the XLA mask path). RoPE uses per-batch frequency rows. Cache must
    be the layered bhsd layout. Returns ([B, V] float32 logits, cache)."""
    seq_pos = jnp.asarray(seq_pos, jnp.int32)
    h = embed_tokens(params, token)
    h, cache = forward_hidden(
        params,
        args,
        h,
        seq_pos[:, None],
        None,
        cache=cache,
        write_pos=seq_pos,
        kv_valid_len=seq_pos + 1,
        impl=impl,
    )
    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    logits = qmat(h[:, -1, :], params["output"]["weight"])
    return logits.astype(jnp.float32), cache


def decode_step_ragged_multi(
    params: Params,
    args: ModelArgs,
    cache: KVCache,
    tokens: jnp.ndarray,
    seq_pos: jnp.ndarray,
    impl: str = "auto",
):
    """T-token ragged decode — the continuous-batching SPECULATIVE VERIFY
    step (lookup_decode._verify_step batched over slots). Slot b's window
    ``tokens[b]`` occupies absolute positions [seq_pos[b], seq_pos[b]+T):
    cache rows are written there, RoPE uses per-slot position rows, and
    attention is causal WITHIN the window on top of each slot's populated
    prefix (the "causal"+kv_valid_len mask: query i of slot b sees cache
    rows <= seq_pos[b]+i). Returns ([B, T, V] float32 logits — one
    next-token distribution per window position — and the cache).

    Cache discipline: all T rows are written; callers advance seq_pos by
    the accepted count only, so rejected rows hold garbage that the next
    window rewrites before it can ever be attended (the write-before-
    attend invariant; cache pools need T-1 spare rows past the last
    emittable position so the final window never clamps)."""
    seq_pos = jnp.asarray(seq_pos, jnp.int32)
    B, T = tokens.shape
    h = embed_tokens(params, tokens)
    positions = seq_pos[:, None] + jnp.arange(T)[None, :]
    h, cache = forward_hidden(
        params,
        args,
        h,
        positions,
        "causal",
        cache=cache,
        write_pos=seq_pos,
        kv_valid_len=seq_pos + T,
        impl=impl,
    )
    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    logits = qmat(h, params["output"]["weight"])
    return logits.astype(jnp.float32), cache
