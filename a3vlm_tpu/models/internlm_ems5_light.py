"""The released "7B" A3VLM (``llama_type="internlm_ems5_light"``, reference
model/accessory/model/LLM/internlm_ems5_light.py): InternLM2-7B backbone with
only the ConvNeXt-XXL + DINOv2 towers, 1024px inputs, and two crop scales:

- DINOv2 crops: 1024->224 downsample + four 224 quadrants of the
  448-downsample (:144-151)
- ConvNeXt crops: 1024->512 downsample + four 512 quadrants of the raw
  image (:153-159) -> 16x16 map + GAP cls = 257 tokens (no upsample)
- ensemble dim 3072 + 1536 = 4608 -> visual_proj -> hidden (:84-87)
- image_words = (257 + 2) * 5 = 1295 (:89)

InternLM2's decoder block is architecturally LLaMA (RMSNorm + GQA + rotary +
SwiGLU; rope_theta 1e6), so the backbone reuses models/llama with
ModelArgs(n_kv_heads=8, ...); the HF checkpoint importer unfuses InternLM2's
grouped ``wqkv`` layout (checkpoint/torch_import.import_internlm2_hf)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import convnext as cnx
from a3vlm_tpu.models import ens5, llama, vit
from a3vlm_tpu.ops.norms import layer_norm

Params = dict[str, Any]

INTERNLM2_7B = ModelArgs(
    dim=4096, n_layers=32, n_heads=32, n_kv_heads=8, vocab_size=92544,
    multiple_of=256, ffn_dim_multiplier=1.3126,  # -> ffn_hidden_dim 14336
    norm_eps=1e-5, rope_theta=1e6, max_seq_len=4096,
)


@dataclass(frozen=True)
class InternlmEns5Config:
    llama: ModelArgs = INTERNLM2_7B
    convnext: cnx.ConvNeXtConfig = cnx.CONVNEXT_XXLARGE
    dinov2: vit.ViTConfig = vit.DINOV2_VIT_G14
    image_size: int = 1024
    dino_crop: int = 224
    convnext_crop: int = 512

    @property
    def ens_dim(self) -> int:
        return self.convnext.dims[-1] + self.dinov2.width

    @property
    def tokens_per_crop(self) -> int:
        grid = self.dino_crop // self.dinov2.patch_size
        return (grid * grid + 1) + 2

    @property
    def image_words(self) -> int:
        return self.tokens_per_crop * 5


def tiny_config(vocab_size: int = 128) -> InternlmEns5Config:
    return InternlmEns5Config(
        llama=ModelArgs(
            dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            vocab_size=vocab_size, multiple_of=16, max_seq_len=512,
        ),
        convnext=cnx.ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64)),
        dinov2=vit.ViTConfig(
            image_size=28, patch_size=7, width=40, layers=2, heads=4,
            mlp_dim=64, use_swiglu=True, layer_scale=True, pos_grid_size=4,
        ),
        image_size=128,
        dino_crop=28,
        # convnext stride 32: crop 128 -> 4x4 map must equal the dino grid 4
        convnext_crop=128,
    )


def init_params(
    key: jax.Array, cfg: InternlmEns5Config, dtype=jnp.float32
) -> Params:
    D = cfg.llama.dim
    k = jax.random.split(key, 6)
    init = jax.nn.initializers.truncated_normal(0.02)
    return {
        "llama": llama.init_llama_params(k[0], cfg.llama, dtype),
        "convnext": cnx.init_convnext_params(k[1], cfg.convnext, dtype),
        "dinov2": vit.init_vit_params(k[2], cfg.dinov2, dtype),
        "visual_proj": {
            "linear": {
                "weight": init(k[3], (cfg.ens_dim, D), dtype),
                "bias": jnp.zeros((D,), dtype),
            },
            "ln": {
                "weight": jnp.ones((D,), dtype),
                "bias": jnp.zeros((D,), dtype),
            },
        },
        "start_img": jax.random.uniform(k[4], (1, 1, D), dtype),
        "end_img": jax.random.uniform(k[5], (1, 1, D), dtype),
    }


FROZEN_PREFIXES = ("convnext", "dinov2")


def trainable_mask(params: Params) -> Params:
    return {
        k: jax.tree_util.tree_map(lambda _: k not in FROZEN_PREFIXES, v)
        for k, v in params.items()
    }


def _two_scale_crops(image: jnp.ndarray, cfg: InternlmEns5Config):
    """Returns (dino crops [5B,c,c,3], convnext crops [5B,C,C,3]) in the
    reference's PER-IMAGE-interleaved order (stack dim=1 then flatten,
    internlm_ems5_light.py:144-159)."""
    B = image.shape[0]

    def resize(img, s):
        return jax.image.resize(
            img.astype(jnp.float32), (img.shape[0], s, s, 3), method="bicubic"
        ).astype(img.dtype)

    c = cfg.dino_crop
    img_c = resize(image, c)  # full downsample
    img_2c = resize(image, 2 * c)
    parts_c = [
        img_2c[:, :c, :c], img_2c[:, :c, c:], img_2c[:, c:, :c],
        img_2c[:, c:, c:],
    ]
    dino = jnp.stack([img_c] + parts_c, axis=1).reshape(5 * B, c, c, 3)

    C = cfg.convnext_crop
    img_C = resize(image, C)
    half = cfg.image_size // 2
    parts_C = [
        image[:, :half, :half], image[:, :half, half:],
        image[:, half:, :half], image[:, half:, half:],
    ]
    if half != C:
        parts_C = [resize(p, C) for p in parts_C]
    cn = jnp.stack([img_C] + parts_C, axis=1).reshape(5 * B, C, C, 3)
    return dino, cn


def encode_image(params: Params, cfg: InternlmEns5Config, image: jnp.ndarray):
    """image [B, 1024, 1024, 3] CLIP-normalized -> 5 x [B, 257, D]."""
    B = image.shape[0]
    dino_in, cn_in = _two_scale_crops(image, cfg)

    cn = cnx.convnext_forward(params["convnext"], cfg.convnext, cn_in)
    cn = cn.reshape(cn.shape[0], -1, cn.shape[-1])
    cn = jnp.concatenate([cn.mean(axis=1, keepdims=True), cn], axis=1)

    clip_mean = jnp.asarray(ens5.CLIP_MEAN, image.dtype)
    clip_std = jnp.asarray(ens5.CLIP_STD, image.dtype)
    d_mean = jnp.asarray(ens5.DINOV2_MEAN, image.dtype)
    d_std = jnp.asarray(ens5.DINOV2_STD, image.dtype)
    dino_in = dino_in * (clip_std / d_std) + (clip_mean - d_mean) / d_std
    dino = vit.vit_forward(params["dinov2"], cfg.dinov2, dino_in)

    ens = jnp.concatenate([cn, dino], axis=-1)
    ens = jax.lax.stop_gradient(ens)
    p = params["visual_proj"]
    ens = ens @ p["linear"]["weight"] + p["linear"]["bias"]
    ens = layer_norm(ens, p["ln"]["weight"], p["ln"]["bias"], eps=1e-5)
    # per-image interleaved order -> [B, 5, tokens, D] -> 5 x [B, tokens, D]
    ens = ens.reshape(B, 5, *ens.shape[1:])
    return [ens[:, i] for i in range(5)]


def build_image_tokens(params: Params, cfg: InternlmEns5Config, image):
    B = image.shape[0]
    crops = encode_image(params, cfg, image)
    start = jnp.broadcast_to(params["start_img"], (B, 1, cfg.llama.dim))
    end = jnp.broadcast_to(params["end_img"], (B, 1, cfg.llama.dim))
    tokens = jnp.concatenate(
        [
            jnp.concatenate([start, c.astype(start.dtype), end], axis=1)
            for c in crops
        ],
        axis=1,
    )
    assert tokens.shape[1] == cfg.image_words
    return tokens


def forward(
    params: Params, cfg: InternlmEns5Config, examples: jnp.ndarray,
    image: Optional[jnp.ndarray] = None, remat: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    image_tokens = (
        build_image_tokens(params, cfg, image) if image is not None else None
    )
    return llama.forward_train(
        params["llama"], cfg.llama, examples, image_tokens=image_tokens,
        remat=remat, impl=impl,
    )


def prefill(params, cfg, cache, tokens, image=None, impl="auto"):
    image_tokens = (
        build_image_tokens(params, cfg, image) if image is not None else None
    )
    return llama.prefill(
        params["llama"], cfg.llama, cache, tokens,
        image_tokens=image_tokens, impl=impl,
    )


def decode_step(params, cfg, cache, token, seq_pos, impl="auto"):
    return llama.decode_step(
        params["llama"], cfg.llama, cache, token, seq_pos, impl=impl
    )
