"""Tests for the flagship ens5 model: token-layout contract, train/infer
consistency, frozen-tower gradients, TP-sharded encode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3vlm_tpu.models import ens5, llama

CFG = ens5.tiny_ens5_config()


@pytest.fixture(scope="module")
def params():
    return ens5.init_ens5_params(jax.random.PRNGKey(0), CFG)


def _image(b=2):
    return jax.random.normal(
        jax.random.PRNGKey(1), (b, CFG.image_size, CFG.image_size, 3)
    )


def test_token_layout(params):
    """image_words = (num_queries + grid^2+1 + 2) * 5 — the (32+257+2)*5=1455
    contract at real scale (llama_ens5.py:335)."""
    real = ens5.Ens5Config()
    assert real.image_words == 1455
    assert real.ens_dim == 1024 + 3072 + 1536

    toks = ens5.build_image_tokens(params, CFG, _image())
    assert toks.shape == (2, CFG.image_words, CFG.llama.dim)
    # start/end tags appear at the crop boundaries
    per = CFG.tokens_per_crop
    for c in range(5):
        np.testing.assert_allclose(
            np.asarray(toks[0, c * per]),
            np.asarray(params["start_img"][0, 0]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(toks[0, (c + 1) * per - 1]),
            np.asarray(params["end_img"][0, 0]),
            atol=1e-6,
        )


def test_five_crop_layout():
    """Crop batch order: [downsampled, TL, TR, BL, BR] (llama_ens5.py:383-385)."""
    B, c = 1, CFG.crop_size
    img = jnp.arange(B * (2 * c) * (2 * c) * 3, dtype=jnp.float32).reshape(
        B, 2 * c, 2 * c, 3
    )
    crops = ens5.five_crop(img, c)
    assert crops.shape == (5 * B, c, c, 3)
    np.testing.assert_array_equal(np.asarray(crops[1]), np.asarray(img[0, :c, :c]))
    np.testing.assert_array_equal(np.asarray(crops[2]), np.asarray(img[0, :c, c:]))
    np.testing.assert_array_equal(np.asarray(crops[3]), np.asarray(img[0, c:, :c]))
    np.testing.assert_array_equal(np.asarray(crops[4]), np.asarray(img[0, c:, c:]))


def test_forward_shapes(params):
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 10), 1, 100)
    logits = ens5.forward(params, CFG, tokens, image=_image())
    assert logits.shape == (2, 10, CFG.llama.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_prefill_decode_matches_forward(params):
    """Incremental decode with image == full training forward logits."""
    B, S = 1, 6
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, S), 1, 100)
    img = _image(B)
    full = ens5.forward(params, CFG, tokens, image=img)

    W = CFG.image_words
    cache = llama.KVCache.create(
        CFG.llama, B, max_seq_len=W + S + 4, dtype=jnp.float32
    )
    P = 3
    logits, cache, seqlen = ens5.prefill(
        params, CFG, cache, tokens[:, :P], image=img
    )
    assert seqlen == P + W
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, P - 1]), atol=3e-3
    )
    for pos in range(P, S):
        logits, cache = ens5.decode_step(
            params, CFG, cache, tokens[:, pos : pos + 1], jnp.int32(pos + W)
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, pos]), atol=3e-3
        )


def test_frozen_towers_get_zero_grads(params):
    """Gradients flow to the decoder/projectors/tags but not the towers
    (stop_gradient == the reference's no_grad + no_train_prefix)."""
    tokens = jnp.ones((1, 4), jnp.int32)
    labels = jnp.ones((1, 4), jnp.int32) * 2

    def loss_fn(p):
        from a3vlm_tpu.train.losses import next_token_loss

        logits = ens5.forward(p, CFG, tokens, image=_image(1))
        return next_token_loss(logits, labels)

    grads = jax.grad(loss_fn)(params)
    for tower in ens5.FROZEN_PREFIXES:
        norms = jax.tree_util.tree_map(
            lambda g: float(jnp.abs(g).max()), grads[tower]
        )
        assert all(
            v == 0.0 for v in jax.tree_util.tree_leaves(norms)
        ), f"{tower} got grads"
    assert float(jnp.abs(grads["visual_proj"]["linear"]["weight"]).max()) > 0
    assert float(jnp.abs(grads["start_img"]).max()) > 0
    assert (
        float(
            jnp.abs(
                grads["llama"]["layers"]["attention"]["wq"]["weight"]
            ).max()
        )
        > 0
    )


def test_trainable_mask_shape(params):
    mask = ens5.trainable_mask(params)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_m = jax.tree_util.tree_leaves(mask)
    assert len(flat_p) == len(flat_m)
    assert not any(jax.tree_util.tree_leaves(mask["clip"]))
    assert all(jax.tree_util.tree_leaves(mask["llama"]))


def test_encode_sharded_matches_unsharded(params, devices8):
    """Crop-batch sharding over the mesh (the reference's manual MP
    batch-split + all_gather, llama_ens5.py:388-448) must not change
    values."""
    from a3vlm_tpu.parallel import create_mesh
    import dataclasses

    img = _image(2)
    want = ens5.build_image_tokens(params, CFG, img)

    mesh = create_mesh(model_parallel_size=2)
    cfg_sharded = dataclasses.replace(CFG, crop_shard_axes=("data", "model"))
    with mesh:
        got = jax.jit(
            lambda p, im: ens5.build_image_tokens(p, cfg_sharded, im)
        )(params, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
