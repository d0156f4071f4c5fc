"""ConvNeXt encoder — the OpenCLIP ConvNeXt-XXL tower of the A3VLM ensemble
(reference llama_ens5.py:304-315, 404-419: ``visual.trunk`` with the head's
global-pool/flatten disabled, fed 256x256 crops, producing (3072, 8, 8)
feature maps).

Channels-last (NHWC) layout throughout — the TPU-native conv layout. Block:
7x7 depthwise conv -> LN -> 1x1 expand (4x) -> GELU -> 1x1 project -> gamma
LayerScale -> residual. Stages are separated by LN + 2x2/s2 downsample convs;
the stem is a 4x4/s4 conv + LN.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from a3vlm_tpu.ops.norms import layer_norm
from a3vlm_tpu.quant import QuantizedWeight

Params = dict[str, Any]


@dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple[int, ...] = (3, 4, 30, 3)
    dims: tuple[int, ...] = (384, 768, 1536, 3072)  # convnext_xxlarge
    norm_eps: float = 1e-6
    # apply the timm trunk-head LayerNorm to the final feature map (the
    # open_clip trunk keeps head.norm even with pool/flatten disabled)
    head_norm: bool = True


CONVNEXT_XXLARGE = ConvNeXtConfig()


def init_convnext_params(
    key: jax.Array, cfg: ConvNeXtConfig, dtype=jnp.float32
) -> Params:
    init = jax.nn.initializers.truncated_normal(0.02)
    import numpy as _np

    keys = jax.random.split(key, 1024)
    # host-side key table avoids per-key relay round trips;
    # stays traced under eval_shape (shape-only fabrication)
    keys = iter(keys if isinstance(keys, jax.core.Tracer)
                else _np.asarray(keys))

    def conv(shape):
        return {"kernel": init(next(keys), shape, dtype),
                "bias": jnp.zeros((shape[-1],), dtype)}

    def ln(dim):
        return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    def block(dim):
        return {
            "dwconv": conv((7, 7, 1, dim)),  # depthwise: feature_group=dim
            "norm": ln(dim),
            "pw1": {"weight": init(next(keys), (dim, 4 * dim), dtype),
                    "bias": jnp.zeros((4 * dim,), dtype)},
            "pw2": {"weight": init(next(keys), (4 * dim, dim), dtype),
                    "bias": jnp.zeros((dim,), dtype)},
            "gamma": jnp.full((dim,), 1e-6, dtype),
        }

    stages = []
    for si, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        stage: Params = {
            "blocks": [block(dim) for _ in range(depth)],
        }
        if si > 0:
            stage["downsample"] = {
                "norm": ln(cfg.dims[si - 1]),
                "conv": conv((2, 2, cfg.dims[si - 1], dim)),
            }
        stages.append(stage)

    p: Params = {
        "stem": {"conv": conv((4, 4, 3, cfg.dims[0])), "norm": ln(cfg.dims[0])},
        "stages": stages,
    }
    if cfg.head_norm:
        p["head_norm"] = ln(cfg.dims[-1])
    return p


def _conv2d(x, p, stride: int, groups: int = 1, pad: str | int = "VALID"):
    padding = pad if isinstance(pad, str) else [(pad, pad), (pad, pad)]
    out = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out + p["bias"].astype(x.dtype)


def _lin(x, p):
    """Pointwise linear: dense, or W8A8 int8-MXU when tower-quantized
    (the 1x1 convs carry ~95% of ConvNeXt's FLOPs; dw 7x7 convs and the
    stem/downsample convs stay dense — their leaves are named "kernel",
    which quant.quantize_params never touches)."""
    w = p["weight"]
    if isinstance(w, QuantizedWeight):
        from a3vlm_tpu.ops.quant_matmul import w8a8_matmul

        out = w8a8_matmul(x, w)
    else:
        out = x @ w
    return out + p["bias"]


def _block_fwd(x, bp, eps):
    h = _conv2d(x, bp["dwconv"], stride=1, groups=x.shape[-1], pad=3)
    h = layer_norm(h, bp["norm"]["weight"], bp["norm"]["bias"], eps)
    h = _lin(h, bp["pw1"])
    h = jax.nn.gelu(h, approximate=False)
    h = _lin(h, bp["pw2"])
    return x + h * bp["gamma"]


def convnext_forward(
    params: Params, cfg: ConvNeXtConfig, pixels: jnp.ndarray
) -> jnp.ndarray:
    """pixels [B, H, W, 3] -> features [B, H/32, W/32, dims[-1]] (NHWC; the
    reference's (3072, 8, 8) NCHW map transposed)."""
    x = _conv2d(pixels, params["stem"]["conv"], stride=4)
    x = layer_norm(
        x, params["stem"]["norm"]["weight"], params["stem"]["norm"]["bias"],
        cfg.norm_eps,
    )
    for si, stage in enumerate(params["stages"]):
        if si > 0:
            ds = stage["downsample"]
            x = layer_norm(x, ds["norm"]["weight"], ds["norm"]["bias"], cfg.norm_eps)
            x = _conv2d(x, ds["conv"], stride=2)
        for bp in stage["blocks"]:
            x = _block_fwd(x, bp, cfg.norm_eps)
    if cfg.head_norm and "head_norm" in params:
        x = layer_norm(
            x, params["head_norm"]["weight"], params["head_norm"]["bias"],
            cfg.norm_eps,
        )
    return x
