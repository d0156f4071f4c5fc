"""Tower-feature cache: cached-feature training must be BIT-IDENTICAL to
running the towers in-step (the towers are frozen, so their features are
constants per image), across RAM and disk stores, grad-accum batch
shapes, and the main_finetune CLI flag."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3vlm_tpu.models import ens5


@pytest.fixture(scope="module")
def tiny():
    cfg = ens5.tiny_ens5_config()
    params = ens5.init_ens5_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _images(n, cfg, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )


def test_encode_image_factors_exactly(tiny):
    """encode_image == project(encode_features): the refactor is a pure
    factoring, and forward(image_features=...) equals forward(image=...)
    bit-for-bit."""
    cfg, params = tiny
    img = jnp.asarray(_images(2, cfg))
    feats = ens5.encode_image_features(params, cfg, img)
    assert feats["q"].shape[0] == 10 and feats["ens"].shape[0] == 10
    via_feats = ens5.project_image_features(params, cfg, feats)
    direct = ens5.encode_image(params, cfg, img)
    for a, b in zip(via_feats, direct):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ex = jnp.ones((2, 8), jnp.int32)
    lg_img = ens5.forward(params, cfg, ex, image=img)
    lg_feat = ens5.forward(params, cfg, ex, image_features=feats)
    np.testing.assert_array_equal(np.asarray(lg_img), np.asarray(lg_feat))


@pytest.mark.parametrize("disk", [False, True])
def test_cache_roundtrip_and_layout(tiny, tmp_path, disk):
    """get_batch computes once, replays from the store afterwards, and the
    replayed batch (possibly in a DIFFERENT index order) matches a fresh
    tower run exactly — pinning the crop-major [5B] layout reassembly."""
    from a3vlm_tpu.train.feature_cache import TowerFeatureCache

    cfg, params = tiny
    cache = TowerFeatureCache(
        params, cfg, cache_dir=str(tmp_path / "fc") if disk else None
    )
    imgs = _images(3, cfg)

    first = cache.get_batch([0, 1, 2], imgs)
    assert cache.computed == 1
    # replay in permuted order, images must not be touched (pass garbage)
    perm = [2, 0, 1]
    replay = cache.get_batch(perm, np.zeros_like(imgs))
    assert cache.computed == 1  # no recompute
    fresh = jax.jit(
        lambda p, im: ens5.encode_image_features(p, cfg, im)
    )(params, jnp.asarray(imgs[perm]))
    for k in ("q", "ens"):
        np.testing.assert_array_equal(
            replay[k], np.asarray(fresh[k]), err_msg=k
        )
    # partial miss recomputes the whole batch (one jit shape) and stores
    more = np.concatenate([imgs[:1], _images(2, cfg, seed=9)])
    out = cache.get_batch([0, 7, 8], more)
    assert cache.computed == 2
    assert out["q"].shape == first["q"].shape
    again = cache.get_batch([7, 8], None if False else more[1:])
    assert cache.computed == 2  # now cached


def test_caching_loader_accum_and_passthrough(tiny):
    """FeatureCachingLoader swaps image -> features for [bs] and
    [accum, bs] batches and passes text-only batches through."""
    from a3vlm_tpu.train.feature_cache import (
        FeatureCachingLoader,
        TowerFeatureCache,
    )

    cfg, params = tiny
    imgs = _images(4, cfg)

    class FakeLoader:
        def __len__(self):
            return 2

        def close(self):
            pass

        def __iter__(self):
            yield {
                "examples": np.ones((2, 2, 8), np.int32),
                "image": imgs.reshape(2, 2, *imgs.shape[1:]),
                "_indices": np.arange(4).reshape(2, 2),
            }
            yield {"examples": np.ones((2, 8), np.int32)}

    cache = TowerFeatureCache(params, cfg)
    batches = list(FeatureCachingLoader(FakeLoader(), cache))
    b0, b1 = batches
    assert "image" not in b0 and "_indices" not in b0
    assert b0["image_feat_q"].shape[0] == 2  # accum axis preserved
    assert b0["image_feat_q"].shape[1] == 2 * 5
    assert "image_feat_q" not in b1
    want = np.asarray(jax.jit(
        lambda p, im: ens5.encode_image_features(p, cfg, im)
    )(params, jnp.asarray(imgs[2:]))["q"])
    np.testing.assert_array_equal(b0["image_feat_q"][1], want)


def test_loader_with_indices():
    """DataLoader(with_indices=True) stamps the sampler's dataset indices
    per micro-batch."""
    from a3vlm_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.int32)}

    order = [3, 1, 4, 1, 5, 2, 6, 7]
    loader = DataLoader(
        DS(), order, batch_size=2, accum_steps=2, prefetch=0,
        with_indices=True,
    )
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["_indices"].tolist() == [[3, 1], [4, 1]]
    np.testing.assert_array_equal(
        batches[0]["x"][0, 0], np.full((2,), 3, np.int32)
    )


def test_finetune_cli_cached_features_trains(tmp_path, tiny_tokenizer_dir):
    """main_finetune --cache_tower_features end-to-end (2 epochs, dialog
    data with images): trains to completion and epoch >= 1 reuses the
    cache (no extra tower passes beyond the distinct epoch-0 batches)."""
    import json

    from PIL import Image

    from a3vlm_tpu import main_finetune

    img_path = tmp_path / "img.png"
    Image.new("RGB", (64, 48), (10, 200, 30)).save(img_path)
    records = [
        {
            "image": str(img_path),
            "conversations": [
                {"from": "human", "value": f"Where is door {i}?"},
                {"from": "gpt", "value": f"door {i} here"},
            ],
        }
        for i in range(8)
    ]
    meta = tmp_path / "tasks.json"
    meta.write_text(json.dumps(records))
    cfg = tmp_path / "data.yaml"
    cfg.write_text(f"META:\n - path: {meta}\n   type: image_text\n")
    out_dir = tmp_path / "out"

    argv = [
        "--tokenizer_path", tiny_tokenizer_dir,
        "--data_config", str(cfg),
        "--dialog",
        "--tiny_random_model",
        "--batch_size", "2",
        "--epochs", "2",
        "--warmup_epochs", "0",
        "--lr", "1e-4",
        "--max_words", "256",
        "--num_devices", "1",
        "--precision", "fp32",
        "--cache_tower_features",
        "--feature_cache_dir", str(tmp_path / "fc"),
        "--output_dir", str(out_dir),
        "--print_freq", "1",
    ]
    main_finetune.main(argv)
    assert any(p.name.startswith("epoch") for p in out_dir.iterdir())
    # the disk cache holds one file per dataset item touched
    assert len(list((tmp_path / "fc").glob("feat_*.npz"))) > 0


def test_2images_forward_features_bit_identical(tiny):
    """The 2-images variant accepts cached features for BOTH streams
    (rgb + depth run the same frozen towers) and matches the raw-image
    forward bit-for-bit."""
    from a3vlm_tpu.models import ens5_2images as e2

    cfg, base = tiny
    params = e2.init_params(jax.random.PRNGKey(0), cfg)
    rgb = jnp.asarray(_images(2, cfg, seed=1))
    dep = jnp.asarray(_images(2, cfg, seed=2))
    rgb_f = ens5.encode_image_features(params, cfg, rgb)
    dep_f = ens5.encode_image_features(params, cfg, dep)
    ex = jnp.ones((2, 8), jnp.int32)
    lg_img = e2.forward(params, cfg, ex, image=rgb, depth_image=dep)
    lg_feat = e2.forward(
        params, cfg, ex, image_features=rgb_f, depth_features=dep_f
    )
    np.testing.assert_array_equal(np.asarray(lg_img), np.asarray(lg_feat))
    # mixed sources per stream are legal too
    lg_mix = e2.forward(
        params, cfg, ex, image=rgb, depth_features=dep_f
    )
    np.testing.assert_array_equal(np.asarray(lg_img), np.asarray(lg_mix))
    # half-specified streams are rejected
    with pytest.raises(AssertionError):
        e2.forward(params, cfg, ex, image=rgb)


def test_caching_loader_depth_stream(tiny):
    """Depth batches swap BOTH image keys through separate caches; a
    loader without a depth cache rejects them instead of silently
    training on raw depth pixels."""
    from a3vlm_tpu.train.feature_cache import (
        FeatureCachingLoader,
        TowerFeatureCache,
    )

    cfg, params = tiny
    rgb = _images(2, cfg, seed=3)
    dep = _images(2, cfg, seed=4)

    class FakeLoader:
        def __len__(self):
            return 1

        def close(self):
            pass

        def __iter__(self):
            yield {
                "examples": np.ones((2, 8), np.int32),
                "image": rgb,
                "depth_image": dep,
                "_indices": np.arange(2),
            }

    cache = TowerFeatureCache(params, cfg)
    dcache = TowerFeatureCache(params, cfg)
    (b,) = list(FeatureCachingLoader(FakeLoader(), cache, depth_cache=dcache))
    assert "image" not in b and "depth_image" not in b
    for pre, img in (("image_feat_", rgb), ("depth_feat_", dep)):
        want = jax.jit(
            lambda p, im: ens5.encode_image_features(p, cfg, im)
        )(params, jnp.asarray(img))
        np.testing.assert_array_equal(b[pre + "q"], np.asarray(want["q"]))
        np.testing.assert_array_equal(b[pre + "ens"], np.asarray(want["ens"]))
    # the rgb and depth namespaces must not collide (same indices)
    assert cache.computed == 1 and dcache.computed == 1
    with pytest.raises(ValueError, match="depth_cache"):
        list(FeatureCachingLoader(FakeLoader(), cache))
