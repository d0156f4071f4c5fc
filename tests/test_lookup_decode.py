"""Prompt-lookup speculative decoding: output must EXACTLY equal vanilla
greedy decoding (the speculative guarantee), for both repetitive prompts
(drafts frequently accepted) and unstructured ones (drafts rejected)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.lookup_decode import greedy_reference, lookup_generate
from a3vlm_tpu.models import llama


def _args(vocab=256):
    return ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=vocab,
        multiple_of=16, max_seq_len=160, max_batch_size=1,
    )


def _setup(prompt_ids, args, seed=0, total=160):
    params = llama.unstack_layers(
        llama.init_llama_params(jax.random.PRNGKey(seed), args)
    )
    cache = llama.KVCache.create(
        args, 1, max_seq_len=total, dtype=jnp.float32, layered=True
    )
    logits, cache, _ = llama.prefill(
        params, args, cache, jnp.asarray([prompt_ids], jnp.int32)
    )
    first = int(jnp.argmax(logits[0, :250]))
    return params, cache, first


@pytest.mark.parametrize("seed,repetitive", [(0, True), (1, False), (2, True)])
def test_lookup_matches_greedy(seed, repetitive):
    args = _args()
    rng = np.random.default_rng(seed)
    if repetitive:
        pat = rng.integers(5, 30, size=6).tolist()
        prompt = [1] + pat * 6 + pat[:3]
    else:
        prompt = [1] + rng.integers(5, 250, size=24).tolist()
    params, cache0, first = _setup(prompt, args, seed=seed)
    gen = 24

    # oracle on its own (fresh) cache
    params2, cache_ref, first2 = _setup(prompt, args, seed=seed)
    assert first2 == first
    expected = greedy_reference(
        params, args, cache_ref, len(prompt), first, gen,
        vocab_limit=250, stop_token=2,
    )

    out, count, _ = lookup_generate(
        params, args, cache0, jnp.asarray(prompt, jnp.int32),
        len(prompt), first, gen_len=gen, draft_k=6,
        vocab_limit=250, stop_token=2,
    )
    got = np.asarray(out)[: int(count)].tolist()
    assert got == expected, (repetitive, got, expected)


def test_lookup_respects_stop_token():
    """Immediate stop: when the prefill token IS the stop token both
    decoders emit exactly one token; and a stop later in the stream
    truncates identically (covered by the seeded parametrized cases with
    stop_token=2)."""
    args = _args()
    prompt = [1, 7, 8, 9, 7, 8, 9, 7, 8]
    params, cache, first = _setup(prompt, args, seed=3)
    out, count, _ = lookup_generate(
        params, args, cache, jnp.asarray(prompt, jnp.int32),
        len(prompt), first, gen_len=20, draft_k=4,
        vocab_limit=250, stop_token=first,
    )
    assert int(count) == 1 and int(np.asarray(out)[0]) == first


def test_generator_draft_k_matches_vanilla(tiny_tokenizer):
    """The user surface: Generator.generate(draft_k=K) at batch 1 greedy
    must return EXACTLY the vanilla loop's text — including stop-symbol
    truncation (matched host-side on the lookup path) and the silent
    fallback for ineligible requests (batch > 1)."""
    from a3vlm_tpu.generation import Generator

    tok = tiny_tokenizer
    vocab = ((tok.n_words + 127) // 128) * 128
    args = ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=vocab,
        multiple_of=16, max_seq_len=192, max_batch_size=2,
    )
    params = llama.init_llama_params(jax.random.PRNGKey(0), args)
    gen = Generator(params, args, tok, vocab_limit=tok.n_words)

    prompts = [
        "detect all manipulable object parts and provide their rotated "
        "bounding boxes [0.12,0.34,0.56,0.78,0.90] [0.12,0.34,0.56,"
    ]
    for stops in ((), ("###",), ("0.",)):
        want = gen.generate(
            prompts, max_gen_len=24, temperature=0.0,
            additional_stop_symbols=stops,
        )
        got = gen.generate(
            prompts, max_gen_len=24, temperature=0.0,
            additional_stop_symbols=stops, draft_k=6,
        )
        assert got == want, (stops, got, want)

    # ineligible (batch 2) silently falls back and still matches
    two = prompts * 2
    want = gen.generate(two, max_gen_len=12, temperature=0.0)
    got = gen.generate(two, max_gen_len=12, temperature=0.0, draft_k=6)
    assert got == want
