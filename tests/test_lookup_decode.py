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

    out, count, _, _rounds = lookup_generate(
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
    out, count, _, _rounds = lookup_generate(
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


@pytest.mark.parametrize("caps", [(0,), (1, 0), (1, 1, 0, 1, 0, 1, 1, 0)])
def test_lookup_accept_cap_exact_and_slower(caps):
    """The bench-only acceptance replay: clamping accepted length per
    round never changes the output (accepting fewer verified tokens is
    always legal) and spends MORE verify rounds — the round count the
    realized-acceptance bench leg is designed to pay. caps=(0,) degrades
    to one-token-at-a-time (rounds == emitted - 1 ... +/- the final
    round's freebie)."""
    args = _args()
    pat = [7, 8, 9, 11, 12]
    prompt = [1] + pat * 7  # repetitive: uncapped acceptance is high
    params, cache0, first = _setup(prompt, args, seed=0)
    gen = 24

    params2, cache1, _ = _setup(prompt, args, seed=0)
    base, count0, _, rounds0 = lookup_generate(
        params, args, cache0, jnp.asarray(prompt, jnp.int32),
        len(prompt), first, gen_len=gen, draft_k=6, vocab_limit=250,
        stop_token=2,
    )
    capped, count1, _, rounds1 = lookup_generate(
        params2, args, cache1, jnp.asarray(prompt, jnp.int32),
        len(prompt), first, gen_len=gen, draft_k=6, vocab_limit=250,
        stop_token=2, accept_cap=caps,
    )
    assert int(count0) == int(count1)
    got = np.asarray(capped)[: int(count1)].tolist()
    want = np.asarray(base)[: int(count0)].tolist()
    assert got == want
    assert int(rounds1) >= int(rounds0)
    # the cap binds: rounds must be at least emitted/(mean_cap+1)
    mean_emit = sum(caps) / len(caps) + 1.0
    assert int(rounds1) >= int(np.floor((int(count1) - 1) / mean_emit))


def _toy_fsm(vocab=256, eos=2):
    """Synthetic 3-state grammar table over the tiny test vocab: state 0
    admits [5, 50) -> 1; state 1 admits [5, 120) -> 2; state 2 accepts
    (EOS self-loops) and admits [10, 30) -> 0. Exercises mask rows that
    change every position and an EOS that is only sometimes legal."""
    nxt = np.full((3, vocab), -1, np.int32)
    nxt[0, 5:50] = 1
    nxt[1, 5:120] = 2
    nxt[2, 10:30] = 0
    nxt[2, eos] = 2  # accepting: EOS legal, self-loop
    return nxt


@pytest.mark.parametrize("seed", [0, 1, 4])
def test_lookup_constrained_matches_constrained_greedy(seed):
    """With a grammar table, lookup_generate must equal the one-token
    CONSTRAINED greedy oracle exactly: per-position verify masks follow
    the DFA walked along the (repaired) draft, and the carried state
    resumes correctly across verify windows of varying accepted length."""
    args = _args()
    rng = np.random.default_rng(seed)
    pat = rng.integers(5, 30, size=5).tolist()
    prompt = [1] + pat * 7 + pat[:2]
    fsm = _toy_fsm()
    gen = 24

    def setup():
        # the first token must be drawn under the state-0 mask (the
        # Generator masks prefill logits the same way)
        params = llama.unstack_layers(
            llama.init_llama_params(jax.random.PRNGKey(seed), args)
        )
        cache = llama.KVCache.create(
            args, 1, max_seq_len=160, dtype=jnp.float32, layered=True
        )
        logits, cache, _ = llama.prefill(
            params, args, cache, jnp.asarray([prompt], jnp.int32)
        )
        lg = np.asarray(logits[0], np.float32)[:250]
        lg = np.where(fsm[0, :250] >= 0, lg, -np.inf)
        first = int(np.argmax(lg))
        state0 = max(int(fsm[0, first]), 0)
        return params, cache, first, state0

    params, cache_ref, first, state0 = setup()
    expected = greedy_reference(
        params, args, cache_ref, len(prompt), first, gen,
        vocab_limit=250, stop_token=2, fsm_next=fsm, fsm_state0=state0,
    )
    params, cache0, first2, state02 = setup()
    assert (first2, state02) == (first, state0)
    out, count, _, _rounds = lookup_generate(
        params, args, cache0, jnp.asarray(prompt, jnp.int32),
        len(prompt), first, gen_len=gen, draft_k=6,
        vocab_limit=250, stop_token=2,
        fsm_next=jnp.asarray(fsm), fsm_state0=jnp.int32(state0),
    )
    got = np.asarray(out)[: int(count)].tolist()
    assert got == expected, (got, expected)
    # every emitted token transition is legal under the grammar
    st = state0
    for t in got[1:]:
        row = _toy_fsm()[st]
        assert row[t] >= 0, (st, t)
        st = int(row[t])


def test_generator_constrained_draft_k_matches_vanilla(tiny_tokenizer):
    """The user surface: fsm= and draft_k= COMPOSE at batch 1 — the
    speculative path must return exactly the constrained vanilla loop's
    text, and the text must parse under the grammar."""
    from a3vlm_tpu import constrained as C
    from a3vlm_tpu.generation import Generator

    tok = tiny_tokenizer
    vocab = ((tok.n_words + 127) // 128) * 128
    args = ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=vocab,
        multiple_of=16, max_seq_len=192, max_batch_size=1,
    )
    params = llama.init_llama_params(jax.random.PRNGKey(3), args)
    gen = Generator(params, args, tok, vocab_limit=tok.n_words)
    fsm = C.compile_grammar(C.joint_rec_grammar(), tok)
    prompts = ["provide the joint's type and its 2D rotated bounding box"]
    want = gen.generate(prompts, max_gen_len=48, temperature=0.0, fsm=fsm)
    got = gen.generate(
        prompts, max_gen_len=48, temperature=0.0, fsm=fsm, draft_k=6
    )
    assert got == want, (got, want)
    dfa = C.CharDfa(C.Seq(C.Opt(C.Lit(" ")), C.joint_rec_grammar()))
    assert dfa.matches(got[0]), repr(got[0])


def test_generator_sampled_draft_k_bit_identical(tiny_tokenizer):
    """temperature > 0 composes with draft_k: the speculative path
    precomputes the vanilla loop's rng split chain per emitted index, so
    the sampled text is BIT-IDENTICAL to the vanilla loop with the same
    seed — with and without a grammar."""
    from a3vlm_tpu import constrained as C
    from a3vlm_tpu.generation import Generator

    tok = tiny_tokenizer
    vocab = ((tok.n_words + 127) // 128) * 128
    args = ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=vocab,
        multiple_of=16, max_seq_len=192, max_batch_size=1,
    )
    params = llama.init_llama_params(jax.random.PRNGKey(7), args)
    gen = Generator(params, args, tok, vocab_limit=tok.n_words)
    prompts = ["provide the joint's type and its 2D rotated bounding box"]

    for fsm in (None, C.compile_grammar(C.joint_rec_grammar(), tok)):
        for seed in (0, 3):
            want = gen.generate(
                prompts, max_gen_len=20, temperature=0.8, top_p=0.9,
                seed=seed, fsm=fsm,
            )
            got = gen.generate(
                prompts, max_gen_len=20, temperature=0.8, top_p=0.9,
                seed=seed, fsm=fsm, draft_k=5,
            )
            assert got == want, (fsm is not None, seed, got, want)
