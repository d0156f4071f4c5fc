"""Generic Vision Transformer covering the three ViT towers of the A3VLM
ensemble (reference llama_ens5.py:284-322, 352-435):

- CLIP ViT-L/14 (open_clip 'ViT-L-14'): pre-LN blocks, quick-GELU, ln_pre +
  ln_post, class token, learned pos embed; A3VLM keeps ALL 257 spatial
  tokens and skips the projection (llama_ens5.py:352-375).
- BLIP-2 vision tower (EVA ViT-g/14, hidden 1408): pre-LN blocks, GELU,
  post-LN only.
- DINOv2 ViT-g/14: GELU or SwiGLU FFN (giant = SwiGLU), LayerScale, final
  norm, bicubic pos-embed interpolation for non-native resolutions;
  ``forward_features`` returns (cls, patch) tokens after the final norm
  (consumed at llama_ens5.py:427-435).

All variants share one functional block stack scanned over layers; per-model
weight importers live in checkpoint/torch_import.py. Towers are frozen in
training (llama_ens5.py:345-352), so no remat is applied here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from a3vlm_tpu.ops.attention import attention
from a3vlm_tpu.ops.norms import layer_norm
from a3vlm_tpu.quant import QuantizedWeight

Params = dict[str, Any]


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_dim: int = 4096
    act: str = "gelu"  # "gelu" | "quick_gelu"
    ln_pre: bool = False  # CLIP-style pre-embedding LN
    ln_post: bool = True  # final LN
    use_swiglu: bool = False  # DINOv2-giant SwiGLU FFN
    layer_scale: bool = False  # DINOv2 LayerScale
    patch_bias: bool = True  # conv-stem bias (CLIP: False)
    pos_grid_size: Optional[int] = None  # native pos-embed grid (DINOv2: 37)
    norm_eps: float = 1e-6
    # route encoder attention through the batched Pallas kernel
    # (ops/vit_attention.py) instead of XLA sdpa. On-chip A/B (v5e-1,
    # scripts/vit_attn_ab.py, round 3): kernel 572.7 vs XLA 566.0 img/s at
    # batch 16 (1.01x) and 634.9 vs 533.0 at batch 64 (1.19x) — the kernel
    # wins at every measured batch, so it is the default; the eligibility
    # gate (bf16 + TPU + S<=1024) falls back to XLA everywhere else.
    attn_kernel: bool = True

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


# CLIP ViT-L/14 as used by open_clip 'ViT-L-14' (llama_ens5.py:296-301)
CLIP_VIT_L14 = ViTConfig(
    width=1024, layers=24, heads=16, mlp_dim=4096, act="quick_gelu",
    ln_pre=True, ln_post=True, patch_bias=False, norm_eps=1e-5,
)
# BLIP-2 EVA ViT-g/14 vision tower (Blip2 config, llama_ens5.py:284-293)
BLIP2_VIT_G14 = ViTConfig(
    width=1408, layers=39, heads=16, mlp_dim=6144, act="gelu",
    ln_pre=False, ln_post=True, norm_eps=1e-6,
)
# DINOv2 ViT-g/14 (llama_ens5.py:316-322); native grid 518/14 = 37
DINOV2_VIT_G14 = ViTConfig(
    width=1536, layers=40, heads=24, mlp_dim=4096, act="gelu",
    ln_pre=False, ln_post=True, use_swiglu=True, layer_scale=True,
    pos_grid_size=37, norm_eps=1e-6,
)


def _act(x, kind: str):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def init_vit_params(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    W, L, M = cfg.width, cfg.layers, cfg.mlp_dim
    grid = cfg.pos_grid_size or cfg.grid
    n_pos = grid * grid + 1
    k = jax.random.split(key, 8)
    init = jax.nn.initializers.truncated_normal(0.02)

    def lin(kk, shape):
        return jnp.stack([init(ki, shape, dtype) for ki in jax.random.split(kk, L)])

    def zeros_l(shape):
        return jnp.zeros((L, *shape), dtype)

    mlp_in = (2 * M) if cfg.use_swiglu else M
    p: Params = {
        "patch_embed": {
            "kernel": init(k[0], (cfg.patch_size, cfg.patch_size, 3, W), dtype),
            "bias": jnp.zeros((W,), dtype) if cfg.patch_bias else None,
        },
        "class_embedding": init(k[1], (W,), dtype),
        "positional_embedding": init(k[2], (n_pos, W), dtype),
        "blocks": {
            "ln1": {"weight": jnp.ones((L, W), dtype), "bias": zeros_l((W,))},
            "attn": {
                "wqkv": {"weight": lin(k[3], (W, 3 * W)), "bias": zeros_l((3 * W,))},
                "wo": {"weight": lin(k[4], (W, W)), "bias": zeros_l((W,))},
            },
            "ln2": {"weight": jnp.ones((L, W), dtype), "bias": zeros_l((W,))},
            "mlp": {
                "fc1": {"weight": lin(k[5], (W, mlp_in)), "bias": zeros_l((mlp_in,))},
                "fc2": {"weight": lin(k[6], (M, W)), "bias": zeros_l((W,))},
            },
        },
    }
    if cfg.layer_scale:
        p["blocks"]["ls1"] = jnp.full((L, W), 1e-5, dtype)
        p["blocks"]["ls2"] = jnp.full((L, W), 1e-5, dtype)
    if cfg.ln_pre:
        p["ln_pre"] = {"weight": jnp.ones((W,), dtype), "bias": jnp.zeros((W,), dtype)}
    if cfg.ln_post:
        p["ln_post"] = {"weight": jnp.ones((W,), dtype), "bias": jnp.zeros((W,), dtype)}
    return p


def interpolate_pos_embed(
    pos: jnp.ndarray, src_grid: int, dst_grid: int
) -> jnp.ndarray:
    """Bicubic interpolation of the patch position table (DINOv2 style:
    class-token row kept, patch rows resized [src,src] -> [dst,dst])."""
    if src_grid == dst_grid:
        return pos
    cls_pos, patch_pos = pos[:1], pos[1:]
    W = pos.shape[-1]
    patch_pos = patch_pos.reshape(src_grid, src_grid, W)
    patch_pos = jax.image.resize(
        patch_pos.astype(jnp.float32), (dst_grid, dst_grid, W), method="bicubic"
    ).astype(pos.dtype)
    return jnp.concatenate([cls_pos, patch_pos.reshape(-1, W)], axis=0)


def _lin(x, p):
    """Tower linear: dense ``x @ w + b``, or the W8A8 int8-MXU path when
    the weight was tower-quantized (ens5.quantize_towers /
    MetaModel.quantize(tower_bits=8)). Dispatch is by param type so the
    scanned block stack needs no config plumbing — scan slices the
    QuantizedWeight's (q, scale) children per layer like any leaf."""
    w = p["weight"]
    if isinstance(w, QuantizedWeight):
        from a3vlm_tpu.ops.quant_matmul import w8a8_matmul

        out = w8a8_matmul(x, w)
    else:
        out = x @ w
    return out + p["bias"]


def _vit_block(h, lp, cfg: ViTConfig):
    B, S, W = h.shape
    x = layer_norm(h, lp["ln1"]["weight"], lp["ln1"]["bias"], cfg.norm_eps)
    qkv = _lin(x, lp["attn"]["wqkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, cfg.heads, cfg.head_dim)
    k = k.reshape(B, S, cfg.heads, cfg.head_dim)
    v = v.reshape(B, S, cfg.heads, cfg.head_dim)
    if cfg.attn_kernel:
        from a3vlm_tpu.ops.vit_attention import (
            vit_attention,
            vit_attention_eligible,
        )

        if vit_attention_eligible(q.shape, q.dtype):
            out = vit_attention(q, k, v)
        else:
            out = attention(q, k, v, mask=None)
    else:
        out = attention(q, k, v, mask=None)
    out = _lin(out.reshape(B, S, W), lp["attn"]["wo"])
    if cfg.layer_scale:
        out = out * lp["ls1"]
    h = h + out

    x = layer_norm(h, lp["ln2"]["weight"], lp["ln2"]["bias"], cfg.norm_eps)
    x = _lin(x, lp["mlp"]["fc1"])
    if cfg.use_swiglu:
        gate, up = jnp.split(x, 2, axis=-1)
        x = jax.nn.silu(gate) * up
    else:
        x = _act(x, cfg.act)
    x = _lin(x, lp["mlp"]["fc2"])
    if cfg.layer_scale:
        x = x * lp["ls2"]
    return h + x


def vit_forward(
    params: Params,
    cfg: ViTConfig,
    pixels: jnp.ndarray,  # [B, H, W, 3] channels-last
) -> jnp.ndarray:
    """Returns all token features [B, 1 + grid*grid, width] after ln_post
    (CLIP: the ``clip_encode_image`` contract keeping all 257 spatial tokens,
    llama_ens5.py:352-375; DINOv2: x_norm tokens)."""
    B, H, Wd, _ = pixels.shape
    grid = H // cfg.patch_size

    x = jax.lax.conv_general_dilated(
        pixels.astype(params["patch_embed"]["kernel"].dtype),
        params["patch_embed"]["kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, grid, grid, W]
    if params["patch_embed"]["bias"] is not None:
        x = x + params["patch_embed"]["bias"]
    x = x.reshape(B, grid * grid, cfg.width)

    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (B, 1, cfg.width)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)

    pos = params["positional_embedding"]
    src_grid = cfg.pos_grid_size or cfg.grid
    pos = interpolate_pos_embed(pos, src_grid, grid)
    x = x + pos[None].astype(x.dtype)

    if cfg.ln_pre:
        x = layer_norm(
            x, params["ln_pre"]["weight"], params["ln_pre"]["bias"], cfg.norm_eps
        )

    def body(h, lp):
        return _vit_block(h, lp, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    if cfg.ln_post:
        x = layer_norm(
            x, params["ln_post"]["weight"], params["ln_post"]["bias"], cfg.norm_eps
        )
    return x
