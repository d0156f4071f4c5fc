"""Config system.

Replicates the reference's config semantics:

- model config = union of JSON files, last-wins (model/accessory/model/meta.py
  :34-40), materialized into a ``ModelArgs`` dataclass
  (model/LLM/llama_ens5.py:33-50).
- data config = YAML with a META list of per-source entries
  (data/alpaca.py:24-29, configs/a3vlm.yaml).
- checkpoint-side probing of ``meta.json`` (llama_type) and ``config.json``
  (llama_config) (meta.py:164-194).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional, Sequence


@dataclass(frozen=True)
class ModelArgs:
    """Decoder hyper-params; defaults are LLaMA-2-13B like the reference
    (llama_ens5.py:34-50)."""

    dim: int = 5120
    n_layers: int = 40
    n_heads: int = 40
    n_kv_heads: Optional[int] = None
    vocab_size: int = -1  # set from the tokenizer
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_batch_size: int = 32
    max_seq_len: int = 2048
    rope_scaling: Optional[float] = None
    load_pretrained_visual_encoder: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_heads if self.n_kv_heads is None else self.n_kv_heads

    @property
    def ffn_hidden_dim(self) -> int:
        """SwiGLU hidden size (llama_ens5.py:195-200)."""
        hidden = int(2 * (4 * self.dim) / 3)
        if self.ffn_dim_multiplier is not None:
            hidden = int(self.ffn_dim_multiplier * hidden)
        return self.multiple_of * ((hidden + self.multiple_of - 1) // self.multiple_of)

    def replace(self, **kw) -> "ModelArgs":
        return dataclasses.replace(self, **kw)


def load_config_union(paths: Sequence[str | Path]) -> dict[str, Any]:
    """Union of JSON config files, later files win (meta.py:34-40)."""
    merged: dict[str, Any] = {}
    for p in paths:
        with open(p) as f:
            merged.update(json.load(f))
    return merged


def model_args_from_json(
    paths: Sequence[str | Path], **overrides
) -> ModelArgs:
    cfg = load_config_union(paths)
    cfg.update(overrides)
    fields = {f.name for f in dataclasses.fields(ModelArgs)}
    return ModelArgs(**{k: v for k, v in cfg.items() if k in fields})


def probe_pretrained_dir(path: str | Path) -> dict[str, Any]:
    """Probe a checkpoint dir for meta.json / config.json like
    meta.py:164-194. Returns {"llama_type": ..., "llama_config": {...}}."""
    path = Path(path)
    out: dict[str, Any] = {}
    meta = path / "meta.json"
    if meta.exists():
        with open(meta) as f:
            out["llama_type"] = json.load(f).get("llama_type")
    cfg = path / "config.json"
    if cfg.exists():
        with open(cfg) as f:
            out["llama_config"] = json.load(f)
    return out


@dataclass(frozen=True)
class DataSourceConfig:
    """One entry of the YAML META list (data/alpaca.py:71-111)."""

    path: str
    type: str = "text"
    ratio: float = 1.0
    root: Optional[str] = None
    preprocess: str = "default"


def load_data_config(path: str | Path) -> list[DataSourceConfig]:
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    fields = {f.name for f in dataclasses.fields(DataSourceConfig)}
    return [
        DataSourceConfig(**{k: v for k, v in entry.items() if k in fields})
        for entry in cfg["META"]
    ]
