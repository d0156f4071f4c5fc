"""Weight-only quantization (the reference's bitsandbytes NF4/int8 path,
util/quant.py, rebuilt TPU-native):

- symmetric per-output-channel int8, or group-wise int4 (split-half packed,
  two nibbles per int8 byte) — the TPU-friendly analogues of
  ``Linear8bitLt`` / ``Linear4bit``.
- quantization wraps weights only; the matmul runs in the activation dtype.
  Both widths go through fused Pallas dequant-matmul kernels
  (ops/quant_matmul.py) on TPU — int4 nibbles are unpacked and int8 scaled
  in VMEM, so the dequantized weight never materializes in HBM.
- blocklist semantics: subtrees named by the model's ``quant_blocklist``
  (vision towers + projectors, llama_ens5.py:541-550) stay dense, as do
  1-D params (norms/biases), matching util/quant.py:18-93's layer filter.

A quantized leaf is a ``QuantizedWeight`` pytree node ((q, scale) as
children; (bits, group, in_dim) static aux) that ``dequantize_params`` turns
back into dense weights inside jit.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

GROUP_SIZE = 64  # int4 quant group along the input dim
MODEL_AXIS = "model"  # TP mesh axis name (parallel/mesh.py; no import cycle)


class QuantizedWeight:
    """Pytree node: (q, scale) as children, (bits, group, in_dim, k_chunks)
    static.

    ``k_chunks > 1`` marks CHUNK-PACKED int4 (round 4): the padded input
    dim is split into ``k_chunks`` equal chunks and split-half packing is
    applied per chunk, with ``q`` stored [*, k_chunks, Kc/2, N] and
    ``scale`` [*, k_chunks, Kc/group, N]. A contiguous shard of the chunk
    axis is then EXACTLY the standard split-half packing of that K-shard,
    which is what makes int4 weights row-parallel (K-sharded) under TP —
    the fairscale RowParallelLinear layout for wo/w2
    (reference llama_ens5.py:202-210) that plain split-half packing cannot
    express (byte row r pairs global rows (r, r + K/2))."""

    def __init__(self, q, scale, bits: int, group: int = 0, in_dim: int = 0,
                 k_chunks: int = 1):
        self.q = q
        self.scale = scale
        self.bits = bits
        self.group = group
        self.in_dim = in_dim
        self.k_chunks = k_chunks

    def tree_flatten(self):
        return (self.q, self.scale), (
            self.bits, self.group, self.in_dim, self.k_chunks
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


jax.tree_util.register_pytree_node(
    QuantizedWeight,
    lambda qw: qw.tree_flatten(),
    QuantizedWeight.tree_unflatten,
)


class LoraWeight:
    """Pytree node pairing a base weight (dense array or
    ``QuantizedWeight``) with a rank-r adapter: the effective weight is
    ``W + a @ b``. ``qmat`` computes the base matmul in its native form
    (fused dequant kernel for packed bases) and adds the skinny
    ``(x @ a) @ b`` side-path — the reference's QLoRA structure, where
    bitsandbytes' quantized forward keeps the LoRA adds around it
    (util/quant.py:95-164 keeps ``lora_a/lora_b`` dense while the base
    Linear is swapped for Params4bit).

    Keeping (a, b) as children means stacked [L, ...] adapters ride the
    layer ``lax.scan`` exactly like the base weights do."""

    def __init__(self, w, a, b):
        self.w = w
        self.a = a
        self.b = b

    def tree_flatten(self):
        return (self.w, self.a, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


jax.tree_util.register_pytree_node(
    LoraWeight,
    lambda lw: lw.tree_flatten(),
    LoraWeight.tree_unflatten,
)


def _quantize_leaf_int8(w: np.ndarray) -> QuantizedWeight:
    # per-output-channel scale along the in_dim axis ONLY: leading (stacked
    # layer) axes keep independent scales per layer
    scale = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = np.maximum(scale, 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return QuantizedWeight(
        jnp.asarray(q), jnp.asarray(scale.astype(np.float32)), bits=8
    )


KERNEL_K_ALIGN = 1024  # fused-kernel alignment: padded in_dim % 1024 == 0


def int4_geometry(in_dim: int) -> tuple[int, int]:
    """(padded_in_dim, group) the int4 packer uses for a weight with this
    input dim — shared with fabricated/imported quantized params."""
    pad_in = in_dim
    if in_dim >= KERNEL_K_ALIGN:
        pad_in = -(-in_dim // KERNEL_K_ALIGN) * KERNEL_K_ALIGN
        # a 4096-aligned in_dim unlocks the kernel's fastest K block
        # (BK=2048: measured 429 vs 238 GB/s on the 11008-deep ffn-down
        # matmul) — take it when the extra zero rows cost <= 12.5%
        pad4096 = -(-in_dim // 4096) * 4096
        if pad4096 <= 1.125 * in_dim:
            pad_in = max(pad_in, pad4096)
    g = min(GROUP_SIZE, pad_in)
    while pad_in % g or (pad_in // 2) % g:
        g //= 2
    return pad_in, g


def int4_chunked_geometry(in_dim: int, k_chunks: int):
    """(padded_in_dim, group) for CHUNK-PACKED int4, or None when the dim
    cannot chunk without >12.5% zero-padding. Every chunk is 512-row
    aligned so the per-shard kernel keeps lane/sublane-aligned blocks
    (half-chunk % 256 with BK down to 256; group 32 keeps the scale block
    at >= 8 sublanes there)."""
    unit = 512 * k_chunks
    pad_in = -(-in_dim // unit) * unit
    if pad_in > 1.125 * in_dim:
        return None
    return pad_in, 32


def _quantize_leaf_int4(
    w: np.ndarray, k_chunks: int = 1
) -> QuantizedWeight:
    """Group-wise symmetric int4 over the second-to-last dim, packed
    SPLIT-HALF: byte row ``r`` holds row ``r`` in the low nibble and row
    ``r + in/2`` in the high nibble. Unpacking is then two contiguous
    half-matmuls (``x[:, :K/2] @ lo + x[:, K/2:] @ hi``) instead of an
    even/odd interleave — the layout the Pallas fused dequant-matmul kernel
    (ops/quant_matmul.py) consumes directly.

    Large weights are zero-padded along in_dim so the kernel's K-blocking
    and group scales align (see ``int4_geometry``; <=12.5% overhead).

    ``k_chunks > 1``: split the padded input dim into equal chunks and
    split-half pack PER CHUNK, storing q [*, k_chunks, Kc/2, N] and scale
    [*, k_chunks, Kc/group, N] — the K-shardable layout (see
    QuantizedWeight). Quantized VALUES are a function of (pad_in, group)
    only; chunking changes byte LAYOUT, so quantize->shard commutes."""
    *lead, in_dim, out_dim = w.shape
    assert in_dim % 2 == 0, "int4 packing needs an even input dim"
    if k_chunks > 1:
        geo = int4_chunked_geometry(in_dim, k_chunks)
        assert geo is not None, (in_dim, k_chunks)
        pad_in, g = geo
    else:
        pad_in, g = int4_geometry(in_dim)
    if pad_in != in_dim:
        w = np.concatenate(
            [w, np.zeros((*lead, pad_in - in_dim, out_dim), w.dtype)],
            axis=-2,
        )
    wg = w.reshape(*lead, pad_in // g, g, out_dim)
    scale = np.max(np.abs(wg), axis=-2, keepdims=True)
    scale = np.maximum(scale, 1e-8) / 7.0
    q = np.clip(np.round(wg / scale), -7, 7).astype(np.int8)
    q = q.reshape(*lead, pad_in, out_dim)
    scale = scale.reshape(*lead, pad_in // g, out_dim).astype(np.float32)
    if k_chunks > 1:
        Kc = pad_in // k_chunks
        halfc = Kc // 2
        qc = q.reshape(*lead, k_chunks, Kc, out_dim)
        lo = qc[..., :halfc, :] & 0x0F
        hi = (qc[..., halfc:, :] & 0x0F) << 4
        packed = (lo | hi).astype(np.int8)
        return QuantizedWeight(
            jnp.asarray(packed),
            jnp.asarray(
                scale.reshape(*lead, k_chunks, Kc // g, out_dim)
            ),
            bits=4, group=g, in_dim=in_dim, k_chunks=k_chunks,
        )
    half = pad_in // 2
    lo = q[..., :half, :] & 0x0F
    hi = (q[..., half:, :] & 0x0F) << 4
    packed = (lo | hi).astype(np.int8)
    return QuantizedWeight(
        jnp.asarray(packed),
        jnp.asarray(scale),
        bits=4, group=g, in_dim=in_dim,
    )


def unpack_int4(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split-half packed int4 bytes -> (lo, hi) sign-extended int8 halves."""
    lo = (packed & 0x0F).astype(jnp.int8)
    hi = ((packed >> 4) & 0x0F).astype(jnp.int8)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return lo, hi


def _dequantize_leaf(leaf: QuantizedWeight, dtype=jnp.bfloat16):
    if leaf.bits == 8:
        return (leaf.q.astype(jnp.float32) * leaf.scale).astype(dtype)
    packed = leaf.q
    lo, hi = unpack_int4(packed)
    g, in_dim = leaf.group, leaf.in_dim
    if leaf.k_chunks > 1:
        # [*, c, halfc, N] -> per-chunk halves -> [*, pad_in, N]
        *lead, c, halfc, out_dim = packed.shape
        q = jnp.concatenate([lo, hi], axis=-2)  # [*, c, Kc, N]
        q = q.reshape(*lead, c * 2 * halfc, out_dim)
        scale = leaf.scale.reshape(*lead, c * 2 * halfc // g, out_dim)
    else:
        *lead, half, out_dim = packed.shape
        q = jnp.concatenate([lo, hi], axis=-2)  # [*, pad_in, out]
        scale = leaf.scale
    pad_in = q.shape[-2]
    qg = q.reshape(*lead, pad_in // g, g, out_dim).astype(jnp.float32)
    w = qg * scale[..., :, None, :]
    w = w.reshape(*lead, pad_in, out_dim)
    return w[..., :in_dim, :].astype(dtype)


def _is_quantized_leaf(x) -> bool:
    return isinstance(x, QuantizedWeight)


# ffn weight pairs whose hidden dim must pad TOGETHER for TP output
# sharding: {gate/up name} pad out_dim, {down name} pad in_dim to the same
# lane-aligned width (llama w1/w3 -> w2; falcon mlp up -> down)
_TP_PAD_OUT = {"w1", "w3", "dense_h_to_4h"}
_TP_PAD_IN = {"w2", "dense_4h_to_h"}
# row-parallel (K-sharded) weights under Megatron-style TP: the second
# linear of each pair, whose INPUT dim carries the sharded intermediate
# (fairscale RowParallelLinear, reference llama_ens5.py:202-210)
_ROW_PARALLEL = {"wo", "w2", "dense_4h_to_h"}


def quantize_params(
    params: Any,
    bits: int = 4,
    blocklist: Sequence[str] = (),
    tp_align: int = 0,
    row_parallel: int = 0,
) -> Any:
    """Quantize linear ``weight`` leaves outside blocklisted top-level
    subtrees. Matches the reference's layer filter (util/quant.py:18-93,
    which swaps *Linear* modules): embeddings, norms/layernorms, and biases
    stay dense.

    ``tp_align`` (= model_parallel_size * 128): zero-pads the ffn hidden
    dim to this multiple so the gate/up weights' OUTPUT dim splits into
    lane-aligned TP shards. 7B's 11008 and 13B's 13824 don't divide at
    mp=4/8 without it. The padded gate/up columns are exact zeros ->
    silu(0)*0 = 0 into the down-projection's zero input rows:
    forward-identical to unpadded.

    ``row_parallel`` (= model_parallel_size, int4 only): CHUNK-PACK the
    row-parallel weights (wo/w2, Megatron RowParallelLinear) with
    k_chunks=row_parallel so their input dim K-shards over "model" and the
    matmul psums activation-sized partials instead of all-gathering
    activations into every column-parallel consumer (the ~15 ms of
    [1,1455,4096] prefill gathers in the mp=8 projection, PERFORMANCE.md).
    The ffn pad unit widens to 512*mp so w1/w3 output shards align with
    w2's input chunks. Weights whose dims can't chunk within the padding
    budget (int4_chunked_geometry) silently stay column-parallel."""
    assert bits in (4, 8)
    # embeddings stay dense: the reference's bnb quantize() swaps *Linear*
    # modules only (util/quant.py:18-93) and the native qmat path gathers
    # rows with jnp.take, which needs a dense table
    dense_names = {"tok_embeddings", "word_embeddings"}

    def _keep_dense(names, leaf_name) -> bool:
        if leaf_name != "weight":
            return True  # biases, layer-scale gammas, ...
        return any(
            n in dense_names or "norm" in n or n.startswith("ln")
            for n in names
            if isinstance(n, str)
        )

    # when row-parallel chunking is on, the ffn pad unit must make w1/w3
    # OUTPUT shards coincide with w2 INPUT chunks: 512*mp (a multiple of
    # the lane-alignment tp_align = 128*mp)
    ffn_align = tp_align
    if row_parallel > 1 and bits == 4:
        ffn_align = max(tp_align, 512 * row_parallel)

    def _tp_pad(x, parent):
        if not ffn_align or parent not in (_TP_PAD_OUT | _TP_PAD_IN):
            return x
        axis = -1 if parent in _TP_PAD_OUT else -2
        F = x.shape[axis]
        pad = -F % ffn_align
        if not pad:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return np.pad(x, widths)

    def quantize_tree(tree, root: str):
        def leaf_fn(path, x):
            x = np.asarray(x)
            keys = [getattr(p, "key", None) for p in path]
            leaf_name = keys[-1] if keys else None
            names = [root] + keys[:-1]
            if x.ndim < 2 or _keep_dense(names, leaf_name):
                return jnp.asarray(x)
            parent = keys[-2] if len(keys) > 1 else None
            x = _tp_pad(x, parent)
            if bits == 8 or x.shape[-2] % 2:
                return _quantize_leaf_int8(x)
            if (
                row_parallel > 1
                and parent in _ROW_PARALLEL
                and int4_chunked_geometry(x.shape[-2], row_parallel)
                is not None
            ):
                return _quantize_leaf_int4(x, k_chunks=row_parallel)
            return _quantize_leaf_int4(x)

        return jax.tree_util.tree_map_with_path(leaf_fn, tree)

    out = {}
    for key, sub in params.items():
        if key in blocklist:
            out[key] = sub
        else:
            out[key] = quantize_tree(sub, key)
    return out


def freeze_quantized_mask(params: Any, mask: Any) -> Any:
    """Force the trainable mask to False under every ``QuantizedWeight``
    node (both the packed ints and the scales): packed bases are frozen by
    construction — the reference's bnb ``Params4bit`` never requires grad
    (util/quant.py:116-144), and training updates flow through LoRA
    adapters / dense leaves only (QLoRA, main_finetune.py:172-210)."""

    def fix(p, m):
        if isinstance(p, QuantizedWeight):
            return jax.tree_util.tree_map(lambda _: False, m)
        return m

    return jax.tree_util.tree_map(
        fix, params, mask, is_leaf=_is_quantized_leaf
    )


def dequantize_params(qparams: Any, dtype=jnp.bfloat16) -> Any:
    """Reconstitute dense weights (call inside jit so XLA fuses the dequant
    into consumers)."""

    return jax.tree_util.tree_map(
        lambda x: _dequantize_leaf(x, dtype) if _is_quantized_leaf(x) else x,
        qparams,
        is_leaf=_is_quantized_leaf,
    )


def quantized_partition_specs(dense_specs: Any, params: Any, n_model: int):
    """PartitionSpecs for a (partially) quantized tree.

    QuantizedWeight leaves shard their OUTPUT dim over "model"
    (all-column-parallel TP) by default: the int4 split-half packing pairs
    byte row r with weight rows (r, r + K/2), so the dense row-parallel
    split of wo/w2 (fairscale RowParallelLinear, llama_ens5.py:63-90)
    cannot be expressed as a contiguous shard of the packed bytes —
    instead every quantized matmul shards N and XLA all-gathers the (tiny,
    activation-sized) outputs where consumers need them.

    CHUNK-PACKED leaves (k_chunks > 1, quantize_params(row_parallel=mp))
    shard their CHUNK axis over "model" instead — true row-parallel TP
    with a psum of activation-sized partials (ops/quant_matmul.py
    ``_spmd_int4_rowp``). Weights whose dims don't split into lane-aligned
    shards stay replicated. Dense leaves (norms, embeddings, blocklisted
    towers) keep their dense specs."""
    import jax.sharding as _sh

    def leaf_fn(qw, spec):
        if not isinstance(qw, QuantizedWeight):
            return spec
        N = qw.q.shape[-1]
        axes = [a for a in spec if a is not None] if spec is not None else []
        wants_model = any(
            a == MODEL_AXIS or (isinstance(a, tuple) and MODEL_AXIS in a)
            for a in axes
        )
        if qw.k_chunks > 1:
            # [*, c, halfc, N]: shard the chunk axis (row-parallel)
            lead = qw.q.ndim - 3
            if wants_model and n_model > 1 and qw.k_chunks % n_model == 0:
                qs = _sh.PartitionSpec(
                    *([None] * lead), MODEL_AXIS, None, None
                )
            else:
                qs = _sh.PartitionSpec(*([None] * (lead + 3)))
            return QuantizedWeight(
                qs, qs, qw.bits, qw.group, qw.in_dim, qw.k_chunks
            )
        lead = qw.q.ndim - 2
        if wants_model and n_model > 1 and N % (n_model * 128) == 0:
            qs = _sh.PartitionSpec(*([None] * (lead + 1)), MODEL_AXIS)
        else:
            qs = _sh.PartitionSpec(*([None] * (lead + 2)))
        return QuantizedWeight(qs, qs, qw.bits, qw.group, qw.in_dim)

    return jax.tree_util.tree_map(
        leaf_fn, params, dense_specs, is_leaf=_is_quantized_leaf
    )


def quantized_size_bytes(qparams: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(qparams):
        total += np.asarray(leaf).nbytes
    return total
