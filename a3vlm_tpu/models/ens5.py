"""The A3VLM flagship model (``llama_type="llama_ens5"``): LLaMA-2 decoder +
four frozen vision towers over 5-crop 448px inputs (reference
model/accessory/model/LLM/llama_ens5.py).

Token layout contract (llama_ens5.py:325-339, 461-487):
- 448px image -> 1 bicubic-downsampled 224px + four 224px quadrants (:381-385)
- per crop: 32 Q-Former tokens + 257 ensemble tokens, wrapped in learned
  <start_img>/<end_img> tags -> 291 tokens; 5 crops -> image_words = 1455
- ensemble feature = concat(CLIP 1024, ConvNeXt 3072, DINOv2 1536) = 5632
  (:436-440), with ConvNeXt's 8x8 map 2x-upsampled to 16x16 + GAP cls
  (:404-419) and DINOv2 fed a renormalized image (:427-435)
- sequence = [BOS | image tokens | text]; logits for text positions only

The reference's manual TP trick — shard the 5B crop batch across MP ranks and
all_gather (:388-448) — becomes a sharding constraint putting the crop batch
on the whole mesh; XLA inserts the collectives.

Inputs are NHWC, CLIP-normalized (the dataset transform contract,
data/transform.py:13-36).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import convnext as cnx
from a3vlm_tpu.models import llama, qformer, vit
from a3vlm_tpu.ops.norms import layer_norm
from a3vlm_tpu.quant import QuantizedWeight

Params = dict[str, Any]

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
DINOV2_MEAN = (0.485, 0.456, 0.406)
DINOV2_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class Ens5Config:
    llama: ModelArgs = field(default_factory=ModelArgs)
    clip: vit.ViTConfig = vit.CLIP_VIT_L14
    blip2_vision: vit.ViTConfig = vit.BLIP2_VIT_G14
    qformer: qformer.QFormerConfig = qformer.BLIP2_QFORMER
    convnext: cnx.ConvNeXtConfig = cnx.CONVNEXT_XXLARGE
    dinov2: vit.ViTConfig = vit.DINOV2_VIT_G14
    image_size: int = 448
    crop_size: int = 224
    convnext_size: int = 256
    # shard the 5B crop batch over these mesh axes during encode
    crop_shard_axes: Optional[tuple[str, ...]] = ("data", "model")

    @property
    def ens_dim(self) -> int:
        return self.clip.width + self.convnext.dims[-1] + self.dinov2.width

    @property
    def tokens_per_crop(self) -> int:
        grid = self.crop_size // self.clip.patch_size
        return self.qformer.num_queries + (grid * grid + 1) + 2

    @property
    def image_words(self) -> int:
        return self.tokens_per_crop * 5


def tiny_ens5_config(vocab_size: int = 128) -> Ens5Config:
    """Scaled-down config for tests (keeps every structural ratio)."""
    return Ens5Config(
        llama=ModelArgs(
            dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
            vocab_size=vocab_size, multiple_of=16, max_seq_len=512,
            max_batch_size=4,
        ),
        clip=vit.ViTConfig(
            image_size=28, patch_size=7, width=32, layers=2, heads=4,
            mlp_dim=64, act="quick_gelu", ln_pre=True, patch_bias=False,
        ),
        blip2_vision=vit.ViTConfig(
            image_size=28, patch_size=7, width=48, layers=2, heads=4,
            mlp_dim=96, act="gelu",
        ),
        qformer=qformer.QFormerConfig(
            hidden=32, layers=2, heads=4, intermediate=64, num_queries=8,
            encoder_width=48,
        ),
        convnext=cnx.ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64)),
        dinov2=vit.ViTConfig(
            image_size=28, patch_size=7, width=40, layers=2, heads=4,
            mlp_dim=64, use_swiglu=True, layer_scale=True, pos_grid_size=4,
        ),
        image_size=56,
        crop_size=28,
        # convnext stride-32 map must 2x-upsample to the ViT grid (4):
        # 64/32 = 2 -> 4x4 (+1 GAP) = 17 tokens, matching the ViTs
        convnext_size=64,
        crop_shard_axes=None,
    )


def init_ens5_params(
    key: jax.Array, cfg: Ens5Config, dtype=jnp.float32
) -> Params:
    D = cfg.llama.dim
    k = jax.random.split(key, 10)
    init = jax.nn.initializers.truncated_normal(0.02)

    def proj(kk, in_dim):
        kw, _ = jax.random.split(kk)
        return {
            "linear": {
                "weight": init(kw, (in_dim, D), dtype),
                "bias": jnp.zeros((D,), dtype),
            },
            "ln": {"weight": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        }

    return {
        "llama": llama.init_llama_params(k[0], cfg.llama, dtype),
        "clip": vit.init_vit_params(k[1], cfg.clip, dtype),
        "blip2_vision": vit.init_vit_params(k[2], cfg.blip2_vision, dtype),
        "qformer": qformer.init_qformer_params(k[3], cfg.qformer, dtype),
        "convnext": cnx.init_convnext_params(k[4], cfg.convnext, dtype),
        "dinov2": vit.init_vit_params(k[5], cfg.dinov2, dtype),
        "qformer_proj": proj(k[6], cfg.qformer.hidden),
        "visual_proj": proj(k[7], cfg.ens_dim),
        # learned image tags, U(0,1) init like nn.Parameter(torch.rand(...))
        # (llama_ens5.py:338-339)
        "start_img": jax.random.uniform(k[8], (1, 1, D), dtype),
        "end_img": jax.random.uniform(k[9], (1, 1, D), dtype),
    }


def ens5_partition_specs(cfg: Ens5Config, params: Params) -> Params:
    """TP PartitionSpecs: the decoder gets the fairscale-equivalent splits;
    vision towers and projectors are replicated (they are not TP-sharded in
    the reference either — their parallelism is the crop-batch sharding)."""
    specs = {
        k: jax.tree_util.tree_map(lambda _: P(), v)
        for k, v in params.items()
        if k != "llama"
    }
    specs["llama"] = llama.llama_partition_specs(cfg.llama)
    return specs


FROZEN_PREFIXES = ("clip", "blip2_vision", "qformer", "convnext", "dinov2")


def trainable_mask(params: Params) -> Params:
    """True = trainable. The four vision towers are frozen
    (llama_ens5.py:345-352: no_train_prefix); the projectors and image tags
    train."""

    def mark(tree, trainable):
        return jax.tree_util.tree_map(lambda _: trainable, tree)

    return {
        k: mark(v, k not in FROZEN_PREFIXES) for k, v in params.items()
    }


def quant_blocklist() -> tuple[str, ...]:
    """Param subtrees excluded from weight quantization
    (llama_ens5.py:541-550)."""
    return FROZEN_PREFIXES + ("qformer_proj", "visual_proj")


# towers whose linears dispatch to the W8A8 int8-MXU path when quantized
# (vit._lin / convnext._lin). The Q-Former stays dense: its FLOPs are <2%
# of the tower pass and its MHA is not dispatch-aware.
W8A8_TOWER_KEYS = ("clip", "blip2_vision", "dinov2", "convnext")


def quantize_tower_params(params: Params,
                          keys: tuple[str, ...] = W8A8_TOWER_KEYS) -> Params:
    """Per-output-channel int8 quantization of the FROZEN vision towers —
    the serving-side W8A8 mode (opt-in; NOT in the reference, whose towers
    always run fp16). The five-crop tower pass is MXU-COMPUTE bound
    (~7.5 TFLOPs at batch 1; scripts/profile_towers.py), so int8 MXU dots
    at 2x the bf16 rate attack the ~108 ms tower leg of the image->triad
    p50 directly — a different regime from the decoder's bandwidth-bound
    int4/int8 weight streaming.

    Device-side jnp quantization (same round-half-even absmax math as
    quant._quantize_leaf_int8, which is host/np-side): full-scale towers
    are 6.8 GB bf16 and typically already live on-chip. Only matmul
    ``weight`` leaves outside norm/ln scopes quantize; conv kernels
    (leaf name "kernel"), norms, biases, embeddings, and layer scales
    stay dense — mirroring quant.quantize_params' filter."""

    def _q8(w):
        wf = w.astype(jnp.float32)
        s = jnp.maximum(
            jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-8
        ) / 127.0
        q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
        return QuantizedWeight(q, s, bits=8)

    def leaf_fn(path, x):
        names = [getattr(p, "key", None) for p in path]
        if names[-1] != "weight" or getattr(x, "ndim", 0) < 2:
            return x
        if any(
            isinstance(n, str) and ("norm" in n or n.startswith("ln"))
            for n in names[:-1]
        ):
            return x
        return _q8(x)

    out = dict(params)
    for k in keys:
        if k in out:
            out[k] = jax.tree_util.tree_map_with_path(leaf_fn, out[k])
    return out


def _apply_proj(x, p):
    x = x @ p["linear"]["weight"] + p["linear"]["bias"]
    return layer_norm(x, p["ln"]["weight"], p["ln"]["bias"], eps=1e-5)


def five_crop(image: jnp.ndarray, crop: int) -> jnp.ndarray:
    """[B, 2c, 2c, 3] -> [5B, c, c, 3]: bicubic-downsampled full image then
    the four quadrants, concatenated along batch (llama_ens5.py:381-385)."""
    B, H, W, C = image.shape
    down = jax.image.resize(
        image.astype(jnp.float32), (B, crop, crop, C), method="bicubic"
    ).astype(image.dtype)
    parts = [
        image[:, :crop, :crop],
        image[:, :crop, crop:],
        image[:, crop:, :crop],
        image[:, crop:, crop:],
    ]
    return jnp.concatenate([down] + parts, axis=0)


def encode_image_features(params: Params, cfg: Ens5Config,
                          image: jnp.ndarray):
    """The FROZEN half of encode_image: towers only, no trainable params
    touched. image [B, 448, 448, 3] -> dict with the pre-projection
    features ``q`` [5B, nq, 768] (BLIP-2 Q-Former queries) and ``ens``
    [5B, 257, 5632] (CLIP ++ ConvNeXt ++ DINOv2 ensemble). Because every
    tower is frozen (llama_ens5.py:345-352), these are CONSTANT per image
    for the whole training run — the train-side tower-feature cache
    (train/feature_cache.py) stores them once and later epochs skip the
    towers entirely (~50% of the multimodal step, scripts/profile_train.py)."""
    crops = five_crop(image, cfg.crop_size)  # [5B, c, c, 3]
    if cfg.crop_shard_axes:
        crops = jax.lax.with_sharding_constraint(
            crops, P(cfg.crop_shard_axes, None, None, None)
        )

    # BLIP-2: EVA ViT -> Q-Former queries [5B, nq, 768]
    blip_feats = vit.vit_forward(params["blip2_vision"], cfg.blip2_vision, crops)
    q_feats = qformer.qformer_forward(params["qformer"], cfg.qformer, blip_feats)

    # CLIP: all spatial tokens [5B, 257, 1024]
    clip_feats = vit.vit_forward(params["clip"], cfg.clip, crops)

    # ConvNeXt at 256px -> 8x8 -> nearest 2x upsample -> GAP cls + 256 tokens
    cn_in = jax.image.resize(
        crops.astype(jnp.float32),
        (crops.shape[0], cfg.convnext_size, cfg.convnext_size, 3),
        method="bilinear",
    ).astype(crops.dtype)
    cn = cnx.convnext_forward(params["convnext"], cfg.convnext, cn_in)
    cn = jnp.repeat(jnp.repeat(cn, 2, axis=1), 2, axis=2)  # [5B, 16, 16, C]
    cn = cn.reshape(cn.shape[0], -1, cn.shape[-1])  # [5B, 256, C]
    cn = jnp.concatenate([cn.mean(axis=1, keepdims=True), cn], axis=1)

    # DINOv2 with the renormalization trick (llama_ens5.py:427-435)
    clip_mean = jnp.asarray(CLIP_MEAN, crops.dtype)
    clip_std = jnp.asarray(CLIP_STD, crops.dtype)
    d_mean = jnp.asarray(DINOV2_MEAN, crops.dtype)
    d_std = jnp.asarray(DINOV2_STD, crops.dtype)
    dino_in = (crops * clip_std + clip_mean - d_mean) / d_std
    dino = vit.vit_forward(params["dinov2"], cfg.dinov2, dino_in)

    ens = jnp.concatenate([clip_feats, cn, dino], axis=-1)  # [5B, 257, 5632]

    # the towers are frozen and run under no_grad in the reference
    # (llama_ens5.py:386-450); the projectors (project_image_features) train
    q_feats = jax.lax.stop_gradient(q_feats)
    ens = jax.lax.stop_gradient(ens)
    return {"q": q_feats, "ens": ens}


def project_image_features(params: Params, cfg: Ens5Config, feats):
    """The TRAINABLE half of encode_image: qformer/visual projections +
    per-crop split (llama_ens5.py:452-458). ``feats`` is
    encode_image_features output (possibly loaded from the feature
    cache)."""
    q_feats = feats["q"]
    ens = feats["ens"]
    q_feats = _apply_proj(q_feats, params["qformer_proj"])
    ens = _apply_proj(ens, params["visual_proj"])
    feats = jnp.concatenate([q_feats, ens], axis=1)  # [5B, 32+257, D]
    if cfg.crop_shard_axes:
        # fold the crop-sharded features back to batch-sharded BEFORE the
        # token splice so SPMD does one explicit all-to-all here instead of
        # an involuntary full rematerialization at the concatenate
        feats = jax.lax.with_sharding_constraint(
            feats, P(cfg.crop_shard_axes[0], None, None)
        )
    return list(jnp.split(feats, 5, axis=0))  # 5 x [B, 289, D]


def encode_image(params: Params, cfg: Ens5Config, image: jnp.ndarray):
    """image [B, 448, 448, 3] (CLIP-normalized, NHWC) -> list of 5 crop
    feature tensors [B, 32+257, D] (llama_ens5.py:377-458)."""
    return project_image_features(
        params, cfg, encode_image_features(params, cfg, image)
    )


def build_image_tokens(params: Params, cfg: Ens5Config,
                       image: Optional[jnp.ndarray] = None,
                       image_features=None):
    """encode + wrap each crop in start/end tags -> [B, image_words, D]
    (llama_ens5.py:468-479). Pass EITHER ``image`` (runs the towers) or
    ``image_features`` (the encode_image_features dict, e.g. from the
    tower-feature cache — skips them)."""
    if image_features is not None:
        assert image is None
        crops = project_image_features(params, cfg, image_features)
        B = crops[0].shape[0]
    else:
        crops = encode_image(params, cfg, image)
        B = image.shape[0]
    start = jnp.broadcast_to(params["start_img"], (B, 1, cfg.llama.dim))
    end = jnp.broadcast_to(params["end_img"], (B, 1, cfg.llama.dim))
    tagged = [
        jnp.concatenate([start, c.astype(start.dtype), end], axis=1)
        for c in crops
    ]
    tokens = jnp.concatenate(tagged, axis=1)
    assert tokens.shape[1] == cfg.image_words, (
        tokens.shape, cfg.image_words
    )
    return tokens


def forward(
    params: Params,
    cfg: Ens5Config,
    examples: jnp.ndarray,
    image: Optional[jnp.ndarray] = None,
    remat: bool = False,
    impl: str = "auto",
    image_features=None,
) -> jnp.ndarray:
    """Training forward: logits for text positions [B, S, V]
    (llama_ens5.py:461-487). Vision towers run without gradient tracking via
    stop_gradient (they are frozen, :345-352 + torch.no_grad at :386).
    ``image_features`` (encode_image_features output, e.g. from
    train/feature_cache.py) replaces ``image`` and skips the frozen
    towers; projectors/tags still train through it."""
    image_tokens = None
    if image is not None or image_features is not None:
        image_tokens = build_image_tokens(
            params, cfg, image, image_features=image_features
        )
        # towers + their activations carry no grad; projectors/tags do.
        # (the no_grad block ends before qformer_proj at :452-455)
    return llama.forward_train(
        params["llama"], cfg.llama, examples, image_tokens=image_tokens,
        remat=remat, impl=impl,
    )


def prefill(
    params: Params,
    cfg: Ens5Config,
    cache: llama.KVCache,
    tokens: jnp.ndarray,
    image: Optional[jnp.ndarray] = None,
    impl: str = "auto",
):
    """Inference prefill (llama_ens5.py:490-512)."""
    image_tokens = (
        build_image_tokens(params, cfg, image) if image is not None else None
    )
    return llama.prefill(
        params["llama"], cfg.llama, cache, tokens, image_tokens=image_tokens,
        impl=impl,
    )


def decode_step(params, cfg: Ens5Config, cache, token, seq_pos, impl="auto"):
    return llama.decode_step(
        params["llama"], cfg.llama, cache, token, seq_pos, impl=impl
    )
