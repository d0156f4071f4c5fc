"""RGB + depth two-image A3VLM variant (``llama_type="llama_ens5_2images"``,
reference model/accessory/model/LLM/llama_ens5_2images.py): both images run
through the SAME ens5 encoder ensemble; the sequence is
[BOS | rgb tokens (tagged <start_img>/<end_img>) | depth tokens (tagged
<start_depth_img>/<end_depth_img>) | text] (:466-507), so
image_words = 1455 * 2 = 2910 (:335-336). Inference requires both images
(:518-547)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from a3vlm_tpu.models import ens5, llama

Params = dict[str, Any]

Ens5Config = ens5.Ens5Config
tiny_config = ens5.tiny_ens5_config


def init_params(key: jax.Array, cfg: Ens5Config, dtype=jnp.float32) -> Params:
    params = ens5.init_ens5_params(key, cfg, dtype)
    k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
    D = cfg.llama.dim
    # extra learned depth-image tags (llama_ens5_2images.py:343-344)
    params["start_depth_img"] = jax.random.uniform(k1, (1, 1, D), dtype)
    params["end_depth_img"] = jax.random.uniform(k2, (1, 1, D), dtype)
    return params


def image_words(cfg: Ens5Config) -> int:
    return cfg.image_words * 2


def build_image_tokens(
    params: Params,
    cfg: Ens5Config,
    image: Optional[jnp.ndarray] = None,
    depth_image: Optional[jnp.ndarray] = None,
    image_features=None,
    depth_features=None,
) -> jnp.ndarray:
    """[B, 2*image_words, D]: rgb crops with img tags then depth crops with
    depth tags (llama_ens5_2images.py:479-500). Each stream takes EITHER
    the raw image (runs the frozen towers) or its encode_image_features
    dict (from the tower-feature cache — both towers are frozen, so the
    cache win doubles for this variant)."""
    D = cfg.llama.dim

    def tagged(img, feats, start, end):
        if feats is not None:
            assert img is None, "pass image OR features per stream"
            crops = ens5.project_image_features(params, cfg, feats)
        else:
            crops = ens5.encode_image(params, cfg, img)
        B = crops[0].shape[0]
        s = jnp.broadcast_to(start, (B, 1, D))
        e = jnp.broadcast_to(end, (B, 1, D))
        return jnp.concatenate(
            [
                jnp.concatenate([s, c.astype(s.dtype), e], axis=1)
                for c in crops
            ],
            axis=1,
        )

    rgb = tagged(image, image_features,
                 params["start_img"], params["end_img"])
    dep = tagged(depth_image, depth_features,
                 params["start_depth_img"], params["end_depth_img"])
    return jnp.concatenate([rgb, dep], axis=1)


def forward(
    params: Params,
    cfg: Ens5Config,
    examples: jnp.ndarray,
    image: Optional[jnp.ndarray] = None,
    depth_image: Optional[jnp.ndarray] = None,
    remat: bool = False,
    impl: str = "auto",
    image_features=None,
    depth_features=None,
) -> jnp.ndarray:
    image_tokens = None
    if (image is not None or image_features is not None
            or depth_image is not None or depth_features is not None):
        assert (image is not None) != (image_features is not None), (
            "2-image model needs the rgb stream (image or features)"
        )
        assert (depth_image is not None) != (depth_features is not None), (
            "2-image model needs the depth stream (image or features)"
        )
        image_tokens = build_image_tokens(
            params, cfg, image, depth_image,
            image_features=image_features, depth_features=depth_features,
        )
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
    depth_image: Optional[jnp.ndarray] = None,
    impl: str = "auto",
):
    image_tokens = None
    if image is not None:
        assert depth_image is not None
        image_tokens = build_image_tokens(params, cfg, image, depth_image)
    return llama.prefill(
        params["llama"], cfg.llama, cache, tokens,
        image_tokens=image_tokens, impl=impl,
    )


decode_step = ens5.decode_step
trainable_mask = ens5.trainable_mask
quant_blocklist = ens5.quant_blocklist
ens5_partition_specs = ens5.ens5_partition_specs
