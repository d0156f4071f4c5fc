"""LoRA adapters for the decoder (reference model/accessory/model/peft.py):
``out = W x + B(A x)`` with A trunc-normal(0.02)-initialized, B zeros, no
extra scaling (peft.py:23-55 — the reference applies the delta unscaled).

TPU-native formulation: instead of subclassed linear layers, LoRA is a
separate parameter pytree; ``merge_lora`` folds ``W + (A @ B)`` into the
dense weights inside jit (XLA fuses the rank-r update into the weight load,
and the merged matmul hits the MXU at full tile efficiency — cheaper than a
second skinny matmul chain at train shapes). The TP sharding of A/B follows
the reference's Lora{Column,Row}ParallelLinear placement (peft.py:58-268):
B column-sharded for column-parallel weights, A row-sharded for
row-parallel ones.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def init_lora_params(
    key: jax.Array,
    llama_params: Any,
    rank: int = 16,
    targets: tuple[str, ...] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Any:
    """LoRA tree mirroring the layers/{attention,feed_forward}/{w}/weight
    structure with {"a": [L, in, r], "b": [L, r, out]} leaves."""
    init = jax.nn.initializers.truncated_normal(0.02)
    import numpy as _np

    keys = jax.random.split(key, 64)
    # host-side key table avoids per-key relay round trips;
    # stays traced under eval_shape (shape-only fabrication)
    keys = iter(keys if isinstance(keys, jax.core.Tracer)
                else _np.asarray(keys))
    lora: dict = {"layers": {}}
    for group in ("attention", "feed_forward"):
        for name, wp in llama_params["layers"][group].items():
            if name not in targets:
                continue
            L, in_dim, out_dim = _weight_geometry(wp["weight"])
            lora["layers"].setdefault(group, {})[name] = {
                "a": init(next(keys), (L, in_dim, rank), dtype),
                "b": jnp.zeros((L, rank, out_dim), dtype),
            }
    return lora


def _weight_geometry(w) -> tuple[int, int, int]:
    """(L, in, out) of a stacked base weight — dense array or packed
    ``QuantizedWeight`` (whose adapter must span the ORIGINAL input dim,
    since the side-path consumes unpadded activations, but the PADDED
    output dim, since it adds onto the base matmul's output)."""
    from a3vlm_tpu.quant import QuantizedWeight

    if isinstance(w, QuantizedWeight):
        L = w.q.shape[0]
        out_dim = w.q.shape[-1]
        in_dim = w.in_dim if w.bits == 4 else w.q.shape[-2]
        return L, in_dim, out_dim
    return w.shape


def attach_lora(llama_params: Any, lora: Any) -> Any:
    """Wrap each targeted ``weight`` leaf in a ``LoraWeight(w, a, b)`` node
    (ops.quant_matmul.qmat computes ``qmat(x, w) + (x @ a) @ b``). This is
    the QLoRA forward — required when the base is packed (``merge_lora``
    cannot fold a delta into int4 nibbles) and equally valid for dense
    bases. The stacked [L, ...] adapters are sliced by the layer scan
    alongside the base weights."""
    from a3vlm_tpu.quant import LoraWeight

    out = dict(llama_params)
    layers = dict(llama_params["layers"])
    for group, items in lora["layers"].items():
        new_group = dict(layers[group])
        for name, ab in items.items():
            w = layers[group][name]["weight"]
            new_group[name] = {"weight": LoraWeight(w, ab["a"], ab["b"])}
        layers[group] = new_group
    out["layers"] = layers
    return out


def attach_lora_into_model(params: Any, lora: Any, llama_key: str = "llama"):
    """For wrapped models (ens5): attach into the decoder subtree."""
    out = dict(params)
    out[llama_key] = attach_lora(params[llama_key], lora)
    return out


def fit_lora_to(decoder_params: Any, lora_tree: Any) -> Any:
    """Slice adapter trees to the geometry of the given decoder's weights
    (adapters trained against a tp_align-padded quantized base may carry
    extra padded rows/columns a dense serving base lacks; only
    lora-through-padded-channel second-order terms are dropped)."""
    fitted: dict = {"layers": {}}
    for group, items in lora_tree["layers"].items():
        for name, ab in items.items():
            w = decoder_params["layers"][group][name]["weight"]
            _, in_dim, out_dim = _weight_geometry(w)
            fitted["layers"].setdefault(group, {})[name] = {
                "a": jnp.asarray(ab["a"])[:, :in_dim, :],
                "b": jnp.asarray(ab["b"])[:, :, :out_dim],
            }
    return fitted


def lora_base_trainable_mask(decoder_params: Any) -> Any:
    """Decoder trainability under LoRA: only norm weights and biases keep
    training — the reference's peft rule (llama_peft.get_trainable_params:
    'norm'/'bias'/'lora' in name). Linear weights (adapter-targeted or
    not), embeddings, and the output head freeze; quantized bases fall out
    frozen automatically (their paths carry no 'norm')."""

    def leaf(path, _):
        names = [str(getattr(q, "key", "")) for q in path]
        joined = "/".join(names)
        return (
            "norm" in joined
            or (names and names[-1] == "bias")
            or any(n.startswith("ln") for n in names)
        )

    return jax.tree_util.tree_map_with_path(leaf, decoder_params)


def lora_partition_specs(lora: Any) -> Any:
    """B shards like the base weight's output dim for column-parallel
    weights; A shards the input dim for row-parallel (peft.py:132,238)."""
    col = {"a": P(None, None, None), "b": P(None, None, "model")}
    row = {"a": P(None, "model", None), "b": P(None, None, None)}
    spec: dict = {"layers": {}}
    for group, items in lora["layers"].items():
        spec["layers"][group] = {
            name: (row if name in ("wo", "w2") else col) for name in items
        }
    return spec


def merge_lora(llama_params: Any, lora: Any) -> Any:
    """W_eff = W + A @ B, returned as a new params tree (jit-friendly)."""
    merged = dict(llama_params)
    layers = dict(llama_params["layers"])
    for group, items in lora["layers"].items():
        new_group = dict(layers[group])
        for name, ab in items.items():
            w = layers[group][name]["weight"]
            delta = jnp.einsum(
                "lir,lro->lio", ab["a"].astype(w.dtype), ab["b"].astype(w.dtype)
            )
            new_group[name] = {"weight": w + delta}
        layers[group] = new_group
    merged["layers"] = layers
    return merged


def merge_lora_into_model(params: Any, lora: Any, llama_key: str = "llama"):
    """For wrapped models (ens5): merge into the decoder subtree."""
    out = dict(params)
    out[llama_key] = merge_lora(params[llama_key], lora)
    return out
