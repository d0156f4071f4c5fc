"""Decoder tests: shape contracts, cache-vs-full-forward consistency,
image-token splicing offsets, TP sharding on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import llama
from a3vlm_tpu.parallel import create_mesh, shard_params

TINY = ModelArgs(
    dim=64,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    vocab_size=128,
    multiple_of=16,
    max_batch_size=4,
    max_seq_len=64,
)


@pytest.fixture(scope="module")
def tiny_params():
    return llama.init_llama_params(jax.random.PRNGKey(0), TINY)


def test_forward_train_shapes(tiny_params):
    tokens = jnp.ones((2, 10), jnp.int32)
    logits = llama.forward_train(tiny_params, TINY, tokens)
    assert logits.shape == (2, 10, TINY.vocab_size)


def test_forward_train_image_splice(tiny_params):
    """Logits come back trimmed to the last S positions (llama_ens5.py:486:
    ``output(h[:, image_words:])`` — position 0 of the output is the LAST
    image token, predicting the first text token), and splicing equals a
    manual embed+concat forward."""
    B, S, W = 2, 6, 5
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 1, 100)
    img = jax.random.normal(jax.random.PRNGKey(2), (B, W, TINY.dim)) * 0.1
    logits = llama.forward_train(tiny_params, TINY, tokens, image_tokens=img)
    assert logits.shape == (B, S, TINY.vocab_size)

    # manual splice: [BOS, img tokens, text]
    from a3vlm_tpu.ops.norms import rms_norm

    h = llama.embed_tokens(tiny_params, tokens)
    h = jnp.concatenate([h[:, :1], img.astype(h.dtype), h[:, 1:]], axis=1)
    h, _ = llama.forward_hidden(
        tiny_params, TINY, h, jnp.arange(S + W), "causal"
    )
    h = rms_norm(h, tiny_params["norm"]["weight"], TINY.norm_eps)
    want = h[:, W:, :] @ tiny_params["output"]["weight"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want), atol=1e-5)

    # image content must influence the text logits
    logits2 = llama.forward_train(
        tiny_params, TINY, tokens, image_tokens=img * 2.0
    )
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_prefill_decode_matches_full_forward(tiny_params):
    """Greedy incremental decode must reproduce the full-forward logits —
    pins the KV-cache write positions and the valid-length masking."""
    B, S = 2, 12
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, S), 1, 100)

    # full forward: logits at position i predict token i+1
    full_logits = llama.forward_train(tiny_params, TINY, tokens)

    cache = llama.KVCache.create(TINY, B, dtype=jnp.float32)
    P = 5
    logits, cache, seqlen = llama.prefill(tiny_params, TINY, cache, tokens[:, :P])
    assert seqlen == P
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, P - 1]), atol=2e-3
    )
    for pos in range(P, S):
        logits, cache = llama.decode_step(
            tiny_params, TINY, cache, tokens[:, pos : pos + 1], jnp.int32(pos)
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits[:, pos]), atol=2e-3
        )


def test_prefill_decode_with_image_offset(tiny_params):
    """Cache positions of text tokens are offset by image_words
    (llama_ens5.py:513-521 ``cache_image_words`` semantics)."""
    B, S, W = 1, 8, 4
    tokens = jax.random.randint(jax.random.PRNGKey(4), (B, S), 1, 100)
    img = jax.random.normal(jax.random.PRNGKey(5), (B, W, TINY.dim)) * 0.1

    full_logits = llama.forward_train(tiny_params, TINY, tokens, image_tokens=img)

    cache = llama.KVCache.create(TINY, B, dtype=jnp.float32)
    P = 3
    logits, cache, seqlen = llama.prefill(
        tiny_params, TINY, cache, tokens[:, :P], image_tokens=img
    )
    assert seqlen == P + W
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, P - 1]), atol=2e-3
    )
    for pos in range(P, S):
        logits, cache = llama.decode_step(
            tiny_params,
            TINY,
            cache,
            tokens[:, pos : pos + 1],
            jnp.int32(pos + W),  # seq position includes image words
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits[:, pos]), atol=2e-3
        )


def test_remat_matches_no_remat(tiny_params):
    tokens = jax.random.randint(jax.random.PRNGKey(6), (2, 10), 1, 100)
    a = llama.forward_train(tiny_params, TINY, tokens, remat=False)
    b = llama.forward_train(tiny_params, TINY, tokens, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_sharded_forward_matches_single(tiny_params, devices8):
    """TP=8 sharded forward == unsharded forward: validates the partition
    specs replicate the fairscale Column/Row splits without changing math."""
    mesh = create_mesh(model_parallel_size=8)
    specs = llama.llama_partition_specs(TINY)
    sharded = shard_params(tiny_params, mesh, specs)
    tokens = jax.random.randint(jax.random.PRNGKey(7), (2, 10), 1, 100)

    want = llama.forward_train(tiny_params, TINY, tokens)
    with mesh:
        got = jax.jit(
            lambda p, t: llama.forward_train(p, TINY, t)
        )(sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_dp_tp_mesh_forward(devices8):
    """2x4 (data x model) mesh with batch sharded on data axis."""
    params = llama.init_llama_params(jax.random.PRNGKey(0), TINY)
    mesh = create_mesh(model_parallel_size=4)
    assert mesh.shape == {"data": 2, "model": 4}
    sharded = shard_params(params, mesh, llama.llama_partition_specs(TINY))
    tokens = jax.random.randint(jax.random.PRNGKey(8), (4, 10), 1, 100)
    from jax.sharding import NamedSharding, PartitionSpec as P

    tokens = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    want = llama.forward_train(params, TINY, tokens)
    with mesh:
        got = jax.jit(lambda p, t: llama.forward_train(p, TINY, t))(
            sharded, tokens
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_layered_cache_matches_stacked(tiny_params):
    """The per-layer (decode-optimized) cache layout produces identical
    logits to the stacked scan layout."""
    B, S = 2, 12
    tokens = jax.random.randint(jax.random.PRNGKey(9), (B, S), 1, 100)
    full_logits = llama.forward_train(tiny_params, TINY, tokens)

    cache = llama.KVCache.create(TINY, B, dtype=jnp.float32, layered=True)
    assert cache.layered and len(cache.k) == TINY.n_layers
    P = 5
    logits, cache, _ = llama.prefill(tiny_params, TINY, cache, tokens[:, :P])
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, P - 1]), atol=2e-3
    )
    for pos in range(P, S):
        logits, cache = llama.decode_step(
            tiny_params, TINY, cache, tokens[:, pos : pos + 1], jnp.int32(pos)
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits[:, pos]), atol=2e-3
        )
