"""Checkpoint exporters — interop back to the reference's torch formats:

- ``export_consolidated``: our decoder pytree -> ``consolidated.XX-of-YY
  .model.pth`` TP shards (the reference's native format,
  util/tensor_parallel.py:40-45), loadable by LLaMA2-Accessory.
- ``export_hf_llama``: -> HuggingFace LlamaForCausalLM state dict (the
  tools/convert_weights_to_hf.py equivalent), with the interleaved->
  half-split rotary permutation.
- ``extract_diff`` / ``apply_diff``: delta checkpoints
  (tools/weight_operate.py:17-58).
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np

from a3vlm_tpu.checkpoint.torch_import import split_consolidated_shards


def decoder_params_to_consolidated(params) -> dict[str, np.ndarray]:
    """Our llama pytree (stacked layers, [in,out] weights) -> flat
    ``llma.``-prefixed torch-layout ([out,in]) state dict."""
    out: dict[str, np.ndarray] = {}
    out["llma.tok_embeddings.weight"] = np.asarray(
        params["tok_embeddings"]["weight"], np.float32
    )
    out["llma.norm.weight"] = np.asarray(params["norm"]["weight"], np.float32)
    out["llma.output.weight"] = np.asarray(
        params["output"]["weight"], np.float32
    ).T
    layers = params["layers"]
    n_layers = np.asarray(layers["attention_norm"]["weight"]).shape[0]
    for i in range(n_layers):
        for w in ("wq", "wk", "wv", "wo"):
            out[f"llma.layers.{i}.attention.{w}.weight"] = np.asarray(
                layers["attention"][w]["weight"][i], np.float32
            ).T
        for w in ("w1", "w2", "w3"):
            out[f"llma.layers.{i}.feed_forward.{w}.weight"] = np.asarray(
                layers["feed_forward"][w]["weight"][i], np.float32
            ).T
        out[f"llma.layers.{i}.attention_norm.weight"] = np.asarray(
            layers["attention_norm"]["weight"][i], np.float32
        )
        out[f"llma.layers.{i}.ffn_norm.weight"] = np.asarray(
            layers["ffn_norm"]["weight"][i], np.float32
        )
    return out


def export_consolidated(params, out_dir: str, mp_size: int = 1) -> list[str]:
    import torch

    sd = decoder_params_to_consolidated(params)
    shards = split_consolidated_shards(sd, mp_size)
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    paths = []
    for rank, shard in enumerate(shards):
        p = Path(out_dir) / (
            f"consolidated.{rank:02d}-of-{mp_size:02d}.model.pth"
        )
        torch.save(
            {"model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in shard.items()}}, p
        )
        paths.append(str(p))
    return paths


def _hf_rope_permute(w_t: np.ndarray, n_heads: int) -> np.ndarray:
    """Meta interleaved [in, out] -> HF half-split [in, out] (the forward
    direction of checkpoint/torch_import._hf_rope_unpermute)."""
    in_dim, out_dim = w_t.shape
    hd = out_dim // n_heads
    w = w_t.T.reshape(n_heads, hd // 2, 2, in_dim)
    w = w.transpose(0, 2, 1, 3).reshape(out_dim, in_dim)
    return w.T


def export_hf_llama(params, n_heads: int, n_kv_heads: int | None = None):
    """-> {hf_name: np.ndarray [out,in]} (tools/convert_weights_to_hf.py)."""
    n_kv = n_kv_heads or n_heads
    sd: dict[str, np.ndarray] = {}
    sd["model.embed_tokens.weight"] = np.asarray(
        params["tok_embeddings"]["weight"], np.float32
    )
    sd["model.norm.weight"] = np.asarray(params["norm"]["weight"], np.float32)
    sd["lm_head.weight"] = np.asarray(params["output"]["weight"], np.float32).T
    layers = params["layers"]
    n_layers = np.asarray(layers["attention_norm"]["weight"]).shape[0]
    for i in range(n_layers):
        att = layers["attention"]
        sd[f"model.layers.{i}.self_attn.q_proj.weight"] = _hf_rope_permute(
            np.asarray(att["wq"]["weight"][i], np.float32), n_heads
        ).T
        sd[f"model.layers.{i}.self_attn.k_proj.weight"] = _hf_rope_permute(
            np.asarray(att["wk"]["weight"][i], np.float32), n_kv
        ).T
        sd[f"model.layers.{i}.self_attn.v_proj.weight"] = np.asarray(
            att["wv"]["weight"][i], np.float32
        ).T
        sd[f"model.layers.{i}.self_attn.o_proj.weight"] = np.asarray(
            att["wo"]["weight"][i], np.float32
        ).T
        ff = layers["feed_forward"]
        sd[f"model.layers.{i}.mlp.gate_proj.weight"] = np.asarray(
            ff["w1"]["weight"][i], np.float32
        ).T
        sd[f"model.layers.{i}.mlp.down_proj.weight"] = np.asarray(
            ff["w2"]["weight"][i], np.float32
        ).T
        sd[f"model.layers.{i}.mlp.up_proj.weight"] = np.asarray(
            ff["w3"]["weight"][i], np.float32
        ).T
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(
            layers["attention_norm"]["weight"][i], np.float32
        )
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            layers["ffn_norm"]["weight"][i], np.float32
        )
    return sd


def extract_diff(
    finetuned: Mapping[str, np.ndarray], base: Mapping[str, np.ndarray]
) -> dict[str, np.ndarray]:
    """Delta checkpoint = finetuned - base for shared keys; finetuned-only
    keys kept as-is (tools/weight_operate.py:17-58)."""
    out = {}
    for k, v in finetuned.items():
        v = np.asarray(v)
        out[k] = v - np.asarray(base[k]) if k in base else v
    return out
