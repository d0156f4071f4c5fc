"""End-to-end generation parity: our whole-loop jit generator vs HF
transformers' greedy generate on the same tiny LLaMA weights — pins the
KV-cache bookkeeping, sampling/argmax path, and stop handling."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from a3vlm_tpu.checkpoint import torch_import as ti  # noqa: E402
from a3vlm_tpu.config import ModelArgs  # noqa: E402
from a3vlm_tpu.generation import _generate_loop  # noqa: E402
from a3vlm_tpu.models import llama  # noqa: E402


def test_greedy_generate_matches_hf():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=97, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        rms_norm_eps=1e-5, tie_word_embeddings=False, attention_bias=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    args = ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=97,
        multiple_of=96, ffn_dim_multiplier=0.01, max_seq_len=64,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray,
        ti.import_llama_hf(ti.state_dict_numpy(hf), 2, 4, 4),
    )

    prompts = np.array([[1, 7, 23, 46, 10, 3]], dtype=np.int32)
    gen_len = 12
    with torch.no_grad():
        hf_out = hf.generate(
            torch.from_numpy(prompts).long(),
            max_new_tokens=gen_len,
            do_sample=False,
            eos_token_id=None,  # force full length
            pad_token_id=0,
        ).numpy()

    P = prompts.shape[1]
    total = P + gen_len
    tokens = np.zeros((1, total), np.int32)
    tokens[:, :P] = prompts
    mask = np.zeros((1, total), bool)
    mask[:, :P] = True
    cache = llama.KVCache.create(args, 1, max_seq_len=total,
                                 dtype=jnp.float32)
    out, stop_pos, _ = _generate_loop(
        params, args, cache,
        jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(prompts[:, :4]),
        None, jax.random.PRNGKey(0),
        total_len=total, temperature=0.0, top_p=0.9,
        stop_tokens=((96,),),  # an id HF won't hit
    )
    np.testing.assert_array_equal(np.asarray(out)[0], hf_out[0])


def test_generate_eos_stop_matches_hf_semantics():
    """EOS terminates generation; stop_pos excludes the EOS token like the
    reference's trimming (meta.py:481-484)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=97, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        tie_word_embeddings=False, attention_bias=False,
    )
    torch.manual_seed(1)
    hf = LlamaForCausalLM(hf_cfg).eval()
    args = ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=97,
        multiple_of=96, ffn_dim_multiplier=0.01, max_seq_len=64,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, ti.import_llama_hf(ti.state_dict_numpy(hf), 2, 4, 4)
    )
    prompts = np.array([[1, 5, 9]], dtype=np.int32)
    P, gen_len = 3, 10
    total = P + gen_len
    # find what greedy emits, then declare THAT id as the stop token: the
    # loop must stop right after emitting it
    tokens = np.zeros((1, total), np.int32)
    tokens[:, :P] = prompts
    mask = np.zeros((1, total), bool)
    mask[:, :P] = True
    cache = llama.KVCache.create(args, 1, max_seq_len=total, dtype=jnp.float32)
    free_run, _, _ = _generate_loop(
        params, args, cache, jnp.asarray(tokens), jnp.asarray(mask),
        jnp.asarray(prompts[:, :2]), None, jax.random.PRNGKey(0),
        total_len=total, temperature=0.0, top_p=0.9, stop_tokens=((96,),),
    )
    first_gen = int(np.asarray(free_run)[0, P])

    cache = llama.KVCache.create(args, 1, max_seq_len=total, dtype=jnp.float32)
    out, stop_pos, _ = _generate_loop(
        params, args, cache, jnp.asarray(tokens), jnp.asarray(mask),
        jnp.asarray(prompts[:, :2]), None, jax.random.PRNGKey(0),
        total_len=total, temperature=0.0, top_p=0.9,
        stop_tokens=((first_gen,),),
    )
    # stop_pos points at the start of the stop match: the prompt end
    assert int(np.asarray(stop_pos)[0]) == P
