"""Golden decoder parity: our JAX LLaMA vs HF LlamaForCausalLM on a tiny
random config, through the HF->Meta rotary permutation importer; plus the
consolidated TP shard merge/split round-trip (util/tensor_parallel.py
semantics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from a3vlm_tpu.checkpoint import torch_import as ti  # noqa: E402
from a3vlm_tpu.config import ModelArgs  # noqa: E402
from a3vlm_tpu.models import llama  # noqa: E402


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_llama_matches_hf(kv_heads):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=97,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=kv_heads,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    args = ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=kv_heads, vocab_size=97,
        multiple_of=96, ffn_dim_multiplier=0.01,  # rounds up to exactly 96
        max_seq_len=32,
    )
    assert args.ffn_hidden_dim == 96
    params = ti.import_llama_hf(
        ti.state_dict_numpy(hf), n_layers=2, n_heads=4, n_kv_heads=kv_heads
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)

    tokens = np.array([[1, 5, 9, 23, 46, 3, 77, 12]], dtype=np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens).long()).logits.numpy()

    got = np.asarray(llama.forward_train(params, args, jnp.asarray(tokens)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_consolidated_merge_split_roundtrip():
    rng = np.random.default_rng(0)
    full = {
        "llma.tok_embeddings.weight": rng.standard_normal((16, 8)).astype(np.float32),
        "llma.layers.0.attention.wq.weight": rng.standard_normal((8, 8)).astype(
            np.float32
        ),
        "llma.layers.0.attention.wo.weight": rng.standard_normal((8, 8)).astype(
            np.float32
        ),
        "llma.layers.0.attention_norm.weight": rng.standard_normal(8).astype(
            np.float32
        ),
        "llma.output.weight": rng.standard_normal((16, 8)).astype(np.float32),
    }
    shards = ti.split_consolidated_shards(full, 2)
    # column-parallel wq splits dim 0; row-parallel wo splits dim 1;
    # embedding splits dim 1; norms replicate
    assert shards[0]["llma.layers.0.attention.wq.weight"].shape == (4, 8)
    assert shards[0]["llma.layers.0.attention.wo.weight"].shape == (8, 4)
    assert shards[0]["llma.tok_embeddings.weight"].shape == (16, 4)
    assert shards[0]["llma.layers.0.attention_norm.weight"].shape == (8,)

    merged = ti.merge_consolidated_shards(shards)
    for k in full:
        np.testing.assert_array_equal(merged[k], full[k])


def test_diff_checkpoint_apply():
    base = {"a": np.ones(3, np.float32), "b": np.full(2, 2.0, np.float32)}
    diff = {"a": np.full(3, 0.5, np.float32), "c": np.zeros(1, np.float32)}
    out = ti.apply_diff_checkpoint(base, diff)
    np.testing.assert_array_equal(out["a"], np.full(3, 1.5, np.float32))
    np.testing.assert_array_equal(out["b"], base["b"])
    assert "c" in out


def test_consolidated_import_runs_forward():
    """consolidated (Meta-layout) import -> forward works; validates the
    llma.-prefix strip and [out,in]->[in,out] transposes."""
    args = ModelArgs(
        dim=32, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=64,
        multiple_of=8, max_seq_len=16,
    )
    rng = np.random.default_rng(1)
    F = args.ffn_hidden_dim
    sd = {"llma.tok_embeddings.weight": rng.standard_normal((64, 32)),
          "llma.norm.weight": np.ones(32),
          "llma.output.weight": rng.standard_normal((64, 32))}
    for i in range(2):
        for w, shape in [("wq", (32, 32)), ("wk", (32, 32)), ("wv", (32, 32)),
                         ("wo", (32, 32))]:
            sd[f"llma.layers.{i}.attention.{w}.weight"] = rng.standard_normal(shape)
        for w, shape in [("w1", (F, 32)), ("w2", (32, F)), ("w3", (F, 32))]:
            sd[f"llma.layers.{i}.feed_forward.{w}.weight"] = rng.standard_normal(
                shape
            )
        sd[f"llma.layers.{i}.attention_norm.weight"] = np.ones(32)
        sd[f"llma.layers.{i}.ffn_norm.weight"] = np.ones(32)
    sd = {k: v.astype(np.float32) for k, v in sd.items()}

    params = ti.import_llama_consolidated(sd, n_layers=2)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    logits = llama.forward_train(params, args, jnp.ones((1, 5), jnp.int32))
    assert logits.shape == (1, 5, 64)
    assert np.isfinite(np.asarray(logits)).all()
