"""Continuous batching (serving extension): the ragged decode step and the
slot-pool batcher must reproduce per-request greedy decoding exactly while
overlapping requests of different lengths in one pooled cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import llama
from a3vlm_tpu.serving_batch import ContinuousBatcher, _bucket


def _tiny_args(vocab: int) -> ModelArgs:
    return ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=vocab,
        multiple_of=16, max_seq_len=96, max_batch_size=4,
    )


def _padded_vocab(tok) -> int:
    return -(-tok.n_words // 128) * 128


def _ref_generate(params, args, toks, max_gen_len, stops, dtype,
                  vocab_limit=None):
    """Per-request batch-1 greedy loop through the standard decode path.
    ``vocab_limit`` masks the lane-padded vocab tail like the batcher
    does (without it the two can pick different argmax winners whenever a
    padded-tail logit leads)."""

    def pick(lg):
        lg = np.asarray(lg)
        if vocab_limit is not None:
            lg = lg[..., :vocab_limit]
        return int(np.argmax(lg, axis=-1)[0])

    cache = llama.KVCache.create(
        args, 1, max_seq_len=args.max_seq_len, dtype=dtype, layered=True
    )
    logits, cache, _ = llama.prefill(
        params, args, cache, jnp.asarray([toks], jnp.int32)
    )
    t = pick(logits)
    out = [t]
    pos = len(toks)
    while t not in stops and len(out) < max_gen_len:
        logits, cache = llama.decode_step(
            params, args, cache, jnp.asarray([[t]], jnp.int32), pos
        )
        t = pick(logits)
        out.append(t)
        pos += 1
    for s in stops:
        if s in out:
            out = out[: out.index(s)]
    return out


def test_decode_step_ragged_uniform_matches_decode_step(tiny_tokenizer):
    """At uniform positions the ragged step must equal the scalar-position
    step bit-for-bit (same ops, vectorized position plumbing)."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.unstack_layers(
        llama.init_llama_params(jax.random.PRNGKey(0), args)
    )
    toks = jnp.asarray(
        np.random.default_rng(0).integers(1, 700, size=(2, 12)), jnp.int32
    )
    cache = llama.KVCache.create(
        args, 2, max_seq_len=32, dtype=jnp.float32, layered=True
    )
    logits, cache, _ = llama.prefill(params, args, cache, toks)
    nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]

    l_scalar, c_scalar = llama.decode_step(params, args, cache, nxt, 12)
    l_ragged, c_ragged = llama.decode_step_ragged(
        params, args, cache, nxt, jnp.asarray([12, 12], jnp.int32)
    )
    np.testing.assert_array_equal(np.asarray(l_scalar), np.asarray(l_ragged))
    np.testing.assert_array_equal(
        np.asarray(c_scalar.k[0]), np.asarray(c_ragged.k[0])
    )


def test_decode_step_ragged_mixed_positions(tiny_tokenizer):
    """Slots at DIFFERENT positions: each slot's logits must equal the
    batch-1 run of that slot alone at its own position."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.unstack_layers(
        llama.init_llama_params(jax.random.PRNGKey(1), args)
    )
    rng = np.random.default_rng(1)
    S = 32
    prompts = [rng.integers(1, 700, size=n).tolist() for n in (7, 13)]

    # batch-1 references
    ref_logits = []
    for toks in prompts:
        cache = llama.KVCache.create(
            args, 1, max_seq_len=S, dtype=jnp.float32, layered=True
        )
        logits, cache, _ = llama.prefill(
            params, args, cache, jnp.asarray([toks], jnp.int32)
        )
        t = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        lg, _ = llama.decode_step(params, args, cache, t, len(toks))
        ref_logits.append(np.asarray(lg)[0])

    # pooled ragged batch: prefill each prompt alone, scatter into slots
    from a3vlm_tpu.serving_batch import _write_slot

    pool = llama.KVCache.create(
        args, 2, max_seq_len=S, dtype=jnp.float32, layered=True
    )
    firsts, poss = [], []
    for b, toks in enumerate(prompts):
        c1 = llama.KVCache.create(
            args, 1, max_seq_len=S, dtype=jnp.float32, layered=True
        )
        logits, c1, _ = llama.prefill(
            params, args, c1, jnp.asarray([toks], jnp.int32)
        )
        pool = _write_slot(pool, c1, b)
        firsts.append(int(jnp.argmax(logits, -1)[0]))
        poss.append(len(toks))
    lg, _ = llama.decode_step_ragged(
        params, args, pool,
        jnp.asarray([[firsts[0]], [firsts[1]]], jnp.int32),
        jnp.asarray(poss, jnp.int32),
    )
    got = np.asarray(lg)
    np.testing.assert_allclose(got[0], ref_logits[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[1], ref_logits[1], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kv_bits", [None, 8])
def test_continuous_batcher_matches_per_request(tiny_tokenizer, kv_bits):
    """5 ragged prompts through a 2-slot pool == per-request greedy
    decoding; the pool must actually overlap requests (fewer batched steps
    than the serial sum)."""
    from a3vlm_tpu.ops.decode_attention import kv_cache_dtype

    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(2), args)
    prompts = [
        "### Human: detect all manipulable object parts",
        "the answer is",
        "provide the joint's type and its 2D rotated bounding box",
        "rotated bounding box",
        "Hi my darling",
    ]
    max_gen = 6
    dtype = kv_cache_dtype(kv_bits)
    dec_params = llama.unstack_layers(params)
    expected = [
        _ref_generate(
            dec_params, args, tok.encode(p, bos=True, eos=False), max_gen,
            {tok.eos_id}, dtype,
        )
        for p in prompts
    ]

    batcher = ContinuousBatcher(
        params, args, tok, slots=2, kv_cache_bits=kv_bits
    )
    got = batcher.generate(prompts, max_gen_len=max_gen)
    assert got == [tok.decode(e) for e in expected]
    # overlap: the 2-slot pool advances two requests per step
    serial_steps = sum(max(len(e) - 1, 0) for e in expected)
    assert 0 < batcher.steps < serial_steps


def test_continuous_batcher_image_conditioned(tiny_tokenizer):
    """Image-conditioned requests (tiny ens5): admission encodes each
    request's image and splices the image words; outputs match per-request
    prefill+decode."""
    from a3vlm_tpu.models import ens5

    tok = tiny_tokenizer
    cfg = ens5.tiny_ens5_config(vocab_size=_padded_vocab(tok))
    args = cfg.llama.replace(max_seq_len=256)
    cfg = __import__("dataclasses").replace(cfg, llama=args)
    params = ens5.init_ens5_params(jax.random.PRNGKey(3), cfg)
    dec = llama.unstack_layers(params["llama"])
    rng = np.random.default_rng(3)
    images = [
        rng.uniform(size=(cfg.image_size, cfg.image_size, 3)).astype(
            np.float32
        )
        for _ in range(3)
    ]
    prompts = ["### Human: status of the door?", "detect parts",
               "the answer is"]
    max_gen = 5
    W = cfg.image_words

    expected = []
    for p, im in zip(prompts, images):
        toks = tok.encode(p, bos=True, eos=False)
        it = ens5.build_image_tokens(params, cfg, jnp.asarray(im)[None])
        cache = llama.KVCache.create(
            args, 1, max_seq_len=256, dtype=jnp.float32, layered=True
        )
        logits, cache, _ = llama.prefill(
            dec, args, cache, jnp.asarray([toks], jnp.int32),
            image_tokens=it,
        )
        t = int(jnp.argmax(logits, -1)[0])
        out = [t]
        pos = len(toks) + W
        while t != tok.eos_id and len(out) < max_gen:
            logits, cache = llama.decode_step(
                dec, args, cache, jnp.asarray([[t]], jnp.int32), pos
            )
            t = int(jnp.argmax(logits, -1)[0])
            out.append(t)
            pos += 1
        if tok.eos_id in out:
            out = out[: out.index(tok.eos_id)]
        expected.append(tok.decode(out))

    batcher = ContinuousBatcher(
        params["llama"], args, tok, slots=2, max_seq_len=256,
        ens5_params=params, ens5_cfg=cfg,
    )
    got = batcher.generate(prompts, max_gen_len=max_gen, images=images)
    assert got == expected


def test_continuous_batcher_sampling_and_vocab_limit(tiny_tokenizer):
    """temperature>0 sampling stays inside vocab_limit and is reproducible
    for a fixed seed."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(5), args)
    prompts = ["detect parts", "### Human: hi"]

    def run(seed):
        b = ContinuousBatcher(
            params, args, tok, slots=2, vocab_limit=tok.n_words, seed=seed
        )
        outs = b.generate(prompts, max_gen_len=6, temperature=0.8,
                          top_p=0.9)
        return outs, b

    out_a, ba = run(0)
    out_b, _ = run(0)
    assert out_a == out_b  # same seed -> same samples
    # all emitted ids inside the true vocab (padded tail masked)
    for p, o in zip(prompts, out_a):
        ids = tok.encode(o, bos=False, eos=False)
        assert all(i < tok.n_words for i in ids)


def test_continuous_batcher_mp2_matches_single(devices8, tiny_tokenizer):
    """The slot pool on a (data=4, model=2) mesh (sharded params + pooled
    cache) reproduces the unsharded batcher's outputs."""
    from a3vlm_tpu.parallel import create_mesh, shard_params

    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(6), args)
    prompts = [
        "### Human: detect all manipulable object parts",
        "the answer is",
        "rotated bounding box",
    ]
    ref = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words
    ).generate(prompts, max_gen_len=6)

    mesh = create_mesh(2, devices=devices8)
    sharded = shard_params(params, mesh, llama.llama_partition_specs(args))
    got = ContinuousBatcher(
        sharded, args, tok, slots=2, vocab_limit=tok.n_words, mesh=mesh
    ).generate(prompts, max_gen_len=6)
    assert got == ref


def test_prefix_cached_admission_matches_full_prefill(tiny_tokenizer):
    """Prefix caching: precompute the [BOS | image words] KV once, admit
    each question as a text-only extension — outputs match full-prefill
    admissions on the same image (the eval workload asks ~12 questions per
    object render)."""
    from a3vlm_tpu.models import ens5

    tok = tiny_tokenizer
    cfg = ens5.tiny_ens5_config(vocab_size=_padded_vocab(tok))
    args = cfg.llama.replace(max_seq_len=256)
    cfg = __import__("dataclasses").replace(cfg, llama=args)
    params = ens5.init_ens5_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    image = rng.uniform(size=(cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    prompts = ["### Human: status of the door?", "detect parts",
               "provide the joint type"]
    max_gen = 5

    full = ContinuousBatcher(
        params["llama"], args, tok, slots=2, max_seq_len=256,
        ens5_params=params, ens5_cfg=cfg, vocab_limit=tok.n_words,
    )
    expected = full.generate(
        prompts, max_gen_len=max_gen, images=[image] * 3
    )

    cached = ContinuousBatcher(
        params["llama"], args, tok, slots=2, max_seq_len=256,
        ens5_params=params, ens5_cfg=cfg, vocab_limit=tok.n_words,
    )
    prefix = cached.make_prefix(image=image)
    assert prefix.length == 1 + cfg.image_words
    got = cached.generate(
        prompts, max_gen_len=max_gen, prefixes=[prefix] * 3
    )
    assert got == expected


def test_continuous_batcher_stop_symbols(tiny_tokenizer):
    """Multi-token stop strings truncate the decoded output (the '###'
    conversation separator contract run_eval relies on)."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(8), args)
    prompts = ["detect parts"]
    base = ContinuousBatcher(
        params, args, tok, slots=1, vocab_limit=tok.n_words
    ).generate(prompts, max_gen_len=10)[0]
    if len(base) < 2:
        pytest.skip("degenerate generation; nothing to split")
    # use a substring the model actually produced as the stop symbol
    sym = base[len(base) // 2:]
    got = ContinuousBatcher(
        params, args, tok, slots=1, vocab_limit=tok.n_words
    ).generate(prompts, max_gen_len=10, additional_stop_symbols=[sym])[0]
    assert sym not in got and len(got) <= len(base)


def test_continuous_batcher_int4_weights(tiny_tokenizer):
    """int4 decoder weights + int8 KV through the slot pool (the quantized
    serving combo) == per-request quantized greedy decoding."""
    from a3vlm_tpu.ops.decode_attention import kv_cache_dtype
    from a3vlm_tpu.quant import quantize_params

    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = quantize_params(
        llama.init_llama_params(jax.random.PRNGKey(9), args), bits=4
    )
    prompts = ["detect all manipulable object parts", "the answer is",
               "rotated bounding box"]
    max_gen = 6
    dec = llama.unstack_layers(params)
    expected = [
        _ref_generate(
            dec, args, tok.encode(p, bos=True, eos=False), max_gen,
            {tok.eos_id}, kv_cache_dtype(8), vocab_limit=tok.n_words,
        )
        for p in prompts
    ]
    got = ContinuousBatcher(
        params, args, tok, slots=2, kv_cache_bits=8,
        vocab_limit=tok.n_words,
    ).generate(prompts, max_gen_len=max_gen)
    # vocab_limit masks the padded tail for the batcher but not the raw
    # reference loop; compare against limit-masked reference decode
    exp_txt = [tok.decode(e) for e in expected]
    assert got == exp_txt


@pytest.mark.parametrize("seed,draft_k", [(11, 0), (12, 0), (11, 3),
                                          (13, 5)])
def test_continuous_batcher_fuzz_schedules(tiny_tokenizer, seed, draft_k):
    """Randomized workloads (ragged prompt lengths, ragged gen limits,
    random slot counts) must always reproduce per-request decoding —
    fuzzes the admission/completion schedule space beyond the fixed
    cases; draft_k>0 runs the same schedules through the speculative
    verify rounds."""
    rng = np.random.default_rng(seed)
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(seed), args)
    words = ["detect", "parts", "joint", "box", "the", "answer", "is",
             "rotated", "bounding", "Hi", "darling", "###", "Human:"]
    n = int(rng.integers(4, 8))
    prompts = [
        " ".join(rng.choice(words, size=int(rng.integers(2, 14))))
        for _ in range(n)
    ]
    gens = [int(g) for g in rng.integers(1, 8, size=n)]
    slots = int(rng.integers(1, 4))

    dec = llama.unstack_layers(params)
    expected = [
        tok.decode(
            _ref_generate(dec, args, tok.encode(p, bos=True, eos=False),
                          g, {tok.eos_id}, jnp.float32,
                          vocab_limit=tok.n_words)
        )
        for p, g in zip(prompts, gens)
    ]
    got = ContinuousBatcher(
        params, args, tok, slots=slots, vocab_limit=tok.n_words,
        draft_k=draft_k,
    ).generate(prompts, max_gen_len=gens)
    assert got == expected, (slots, gens, draft_k,
                             [len(p) for p in prompts])


def test_decode_step_ragged_multi_matches_serial(tiny_tokenizer):
    """The T-token ragged verify step must equal T serial one-token ragged
    steps position-for-position (same cache writes, same masks — the
    speculative-decoding correctness bedrock)."""
    from a3vlm_tpu.serving_batch import _write_slot

    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.unstack_layers(
        llama.init_llama_params(jax.random.PRNGKey(4), args)
    )
    rng = np.random.default_rng(4)
    S = 48
    prompts = [rng.integers(1, 700, size=n).tolist() for n in (7, 13)]
    pool = llama.KVCache.create(
        args, 2, max_seq_len=S, dtype=jnp.float32, layered=True
    )
    poss = []
    for b, toks in enumerate(prompts):
        c1 = llama.KVCache.create(
            args, 1, max_seq_len=S, dtype=jnp.float32, layered=True
        )
        _, c1, _ = llama.prefill(
            params, args, c1, jnp.asarray([toks], jnp.int32)
        )
        pool = _write_slot(pool, c1, b)
        poss.append(len(toks))

    T = 3
    window = rng.integers(1, 700, size=(2, T)).astype(np.int32)
    lg_multi, cache_multi = llama.decode_step_ragged_multi(
        params, args, jax.tree_util.tree_map(jnp.copy, pool),
        jnp.asarray(window), jnp.asarray(poss, jnp.int32),
    )
    cache = pool
    for j in range(T):
        lg, cache = llama.decode_step_ragged(
            params, args, cache, jnp.asarray(window[:, j : j + 1]),
            jnp.asarray([p + j for p in poss], jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_multi[:, j]),
            rtol=2e-4, atol=2e-4,
        )
    # cache rows written by the window must match the serial writes
    np.testing.assert_allclose(
        np.asarray(cache_multi.k[0]), np.asarray(cache.k[0]),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("kv_bits", [None, 8])
def test_continuous_batcher_speculative_matches_vanilla(
    tiny_tokenizer, kv_bits
):
    """Prompt-lookup speculative CB (draft_k>0) must emit EXACTLY the
    vanilla greedy output (stop symbols, per-request limits and all) in
    no more — and on loopy content strictly fewer — batched rounds."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(5), args)
    prompts = [
        "detect detect detect detect detect detect detect detect",
        "### Human: detect all manipulable object parts",
        "the answer is the answer is the answer is",
        "Hi my darling",
        "rotated bounding box rotated bounding box",
    ]
    gens = [8, 6, 10, 5, 7]
    vanilla = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words,
        kv_cache_bits=kv_bits,
    )
    expected = vanilla.generate(
        prompts, max_gen_len=gens, additional_stop_symbols=("###",)
    )
    spec = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words,
        kv_cache_bits=kv_bits, draft_k=4,
    )
    got = spec.generate(
        prompts, max_gen_len=gens, additional_stop_symbols=("###",)
    )
    assert got == expected
    # each verify round emits >= 1 token, so rounds never exceed vanilla
    # steps; random tiny weights loop hard, so drafts must land some
    assert spec.steps < vanilla.steps, (spec.steps, vanilla.steps)


def test_continuous_batcher_speculative_with_prefix(tiny_tokenizer):
    """Speculative CB composes with KV prefix caching: a shared text
    prefix + draft_k reproduces the vanilla no-prefix output."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(6), args)
    sys_words = "### Human: please"
    sys_toks = tok.encode(sys_words, bos=False, eos=False)
    questions = ["detect the door", "status of the drawer"]
    expected = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words
    ).generate(
        [sys_words + " " + q for q in questions], max_gen_len=6
    )
    spec = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words, draft_k=3
    )
    prefix = spec.make_prefix(tokens=sys_toks)
    got = spec.generate(
        questions, max_gen_len=6, prefixes=[prefix] * 2
    )
    assert got == expected


def test_continuous_batcher_near_max_prompt(tiny_tokenizer):
    """A prompt whose length bucket would overshoot the pool falls back to
    exact-fit padding (the temp cache must fit a slot's rows)."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))  # max_seq_len 96
    params = llama.init_llama_params(jax.random.PRNGKey(10), args)
    long_prompt = " ".join(["detect"] * 70)
    n = len(tok.encode(long_prompt, bos=True, eos=False))
    assert n > 64 and n + 2 <= 96, n  # bucket(n)=128 > pool 96
    got = ContinuousBatcher(
        params, args, tok, slots=1, vocab_limit=tok.n_words
    ).generate([long_prompt], max_gen_len=2)
    assert isinstance(got[0], str)


def test_continuous_batcher_near_max_prompt_unaligned_prefix(tiny_tokenizer):
    """Near-max admission through a NON-/8-aligned cached prefix: the
    exact-fit fallback must round the combined cache length against the
    pool, not just the text bucket (a /8-rounded Tb on top of an unaligned
    prefix used to build a temp cache longer than the pool and crash
    _write_slot), and the output must equal the no-prefix admission of the
    concatenated prompt."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))  # max_seq_len 96, pool rows 96
    params = llama.init_llama_params(jax.random.PRNGKey(11), args)

    prefix_words = "open the door please see the status of all parts now ok"
    prefix_toks = tok.encode(prefix_words, bos=False, eos=False)
    plen = 1 + len(prefix_toks)
    # largest text that still fits 2 generated tokens in the 96-row pool
    text_words = " ".join(["detect"] * (96 - 2 - plen))
    n_text = len(tok.encode(text_words, bos=False, eos=False))
    assert plen % 8 != 0 and n_text == 96 - 2 - plen, (plen, n_text)
    # bucket(n_text) overshoots the pool -> fallback kicks in; the OLD
    # fallback rounded Tb to /8, so total = round8(plen + round8(n_text))
    # overshot the 96 pool rows -> _write_slot crash. Exact-fit: 96.
    assert -(-(plen + _bucket(n_text)) // 8) * 8 > 96
    assert -(-(plen + -(-n_text // 8) * 8) // 8) * 8 > 96
    assert plen + n_text + 2 <= 96

    expected = ContinuousBatcher(
        params, args, tok, slots=1, vocab_limit=tok.n_words
    ).generate([prefix_words + " " + text_words], max_gen_len=2)

    cb = ContinuousBatcher(
        params, args, tok, slots=1, vocab_limit=tok.n_words
    )
    prefix = cb.make_prefix(tokens=prefix_toks)
    assert prefix.length == plen
    got = cb.generate([text_words], max_gen_len=2, prefixes=[prefix])
    assert got == expected


def test_lookup_draft_longest_suffix_wins():
    """The drafter prefers the LONGEST matching suffix n-gram: here the
    final bigram [3, 4] most recently recurs with continuation 8, but the
    full 4-gram [5, 2, 3, 4] matches earlier with continuation 9 — the
    4-gram must win (templated triad strings repeat short fragments all
    over; longer matched context pins the right continuation)."""
    from a3vlm_tpu.serving_batch import _lookup_draft

    ctx = [5, 2, 3, 4, 9, 9, 1, 3, 4, 8, 5, 2, 3, 4]
    assert _lookup_draft(ctx, 3) == [9, 9, 1]
    # no 4-gram match: falls back to the most recent bigram
    ctx2 = [1, 3, 4, 8, 0, 6, 3, 4]
    assert _lookup_draft(ctx2, 2) == [8, 0]
    # no match at any n: repeat the last token
    assert _lookup_draft([7, 7, 5], 3) == [5, 5, 5]
    # match whose continuation runs off the end gets last-token padding
    assert _lookup_draft([2, 6, 9, 2, 6], 3) == [9, 2, 6]


def test_continuous_batcher_serving_stats(tiny_tokenizer):
    """generate() populates last_stats with per-request TTFT/TPOT and
    pool throughput; counts line up with the returned generations."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(5), args)
    prompts = ["detect all parts", "the answer is", "rotated bounding box"]
    cb = ContinuousBatcher(params, args, tok, slots=2,
                           vocab_limit=tok.n_words)
    cb.generate(prompts, max_gen_len=5)
    s = cb.last_stats
    assert s["requests"] == len(prompts)
    assert s["tokens"] >= len(prompts)  # >= one token per request
    assert s["tokens_per_sec"] > 0
    assert 0 <= s["ttft_p50_s"] <= s["ttft_p95_s"]
    assert 0 <= s["tpot_p50_ms"] <= s["tpot_p95_ms"]
    assert len(s["per_request"]) == len(prompts)


@pytest.mark.parametrize("draft_k", [0, 3])
def test_online_session_matches_generate(tiny_tokenizer, draft_k):
    """OnlineSession (submit/step/poll) reproduces generate()'s outputs
    exactly, including requests submitted MID-STREAM while earlier ones
    are still decoding — the arrival pattern generate() cannot express."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(7), args)
    prompts = [
        "### Human: detect all manipulable object parts",
        "the answer is",
        "provide the joint's type and its 2D rotated bounding box",
        "rotated bounding box",
        "Hi my darling",
    ]
    gens = [6, 4, 7, 3, 5]
    expected = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words,
        draft_k=draft_k,
    ).generate(prompts, max_gen_len=gens)

    cb = ContinuousBatcher(params, args, tok, slots=2,
                           vocab_limit=tok.n_words, draft_k=draft_k)
    sess = cb.online()
    rids = [sess.submit(p, max_gen_len=g)
            for p, g in zip(prompts[:3], gens[:3])]
    for _ in range(3):  # overlap: late arrivals land mid-decode
        sess.step()
    rids += [sess.submit(p, max_gen_len=g)
             for p, g in zip(prompts[3:], gens[3:])]
    sess.drain()
    got = [sess.poll(r) for r in rids]
    assert all(g["done"] for g in got)
    assert [g["text"] for g in got] == expected

    s = sess.stats()
    assert s["requests"] == len(prompts)
    assert s["tokens_per_sec"] > 0
    # late submissions were admitted after arrival: TTFT is sane
    assert all(p["ttft_s"] >= 0 for p in s["per_request"])


def test_online_session_poll_before_done(tiny_tokenizer):
    """poll() mid-decode returns the partial text; queued-but-unadmitted
    requests read as empty and not done."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(9), args)
    cb = ContinuousBatcher(params, args, tok, slots=1,
                           vocab_limit=tok.n_words)
    sess = cb.online()
    r0 = sess.submit("detect all parts", max_gen_len=8)
    r1 = sess.submit("the answer is", max_gen_len=4)  # waits for the slot
    sess.step()
    p0, p1 = sess.poll(r0), sess.poll(r1)
    assert len(p0["tokens"]) >= 1
    assert p1 == {"done": False, "tokens": [], "text": ""}
    sess.drain()
    assert sess.poll(r0)["done"] and sess.poll(r1)["done"]


@pytest.mark.parametrize("use_prefix", [False, True])
def test_batched_admission_matches_single(tiny_tokenizer, use_prefix):
    """4 same-bucket requests admitted into 4 free slots go through ONE
    batched prefill (_admit_group); outputs must equal the slots=1
    batcher, which admits strictly one at a time (never groups) — for
    both plain and shared-prefix admission."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(21), args)
    prompts = [
        "detect all manipulable parts",
        "the answer is a box",
        "rotated bounding box now",
        "Hi my darling again",
    ]

    def run(slots):
        cb = ContinuousBatcher(params, args, tok, slots=slots,
                               vocab_limit=tok.n_words)
        kw = {}
        if use_prefix:
            pre = cb.make_prefix(
                tokens=tok.encode("### system", bos=False, eos=False)
            )
            kw["prefixes"] = [pre] * len(prompts)
        return cb.generate(prompts, max_gen_len=6, **kw)

    assert run(4) == run(1)


# -- grammar-constrained continuous batching ---------------------------------


def _ref_generate_fsm(params, args, toks, max_gen_len, stops, fsm, tok):
    """Per-request constrained greedy through the standard decode path:
    mask each step's logits by the DFA row, argmax, walk the state —
    the host-side reference the pooled fsm path must match exactly."""
    from a3vlm_tpu.ops.decode_attention import kv_cache_dtype

    nxt = fsm.next_state
    V = nxt.shape[1]

    def pick(lg, st):
        lg = np.asarray(lg)[0, :V].copy()
        lg[nxt[st] < 0] = -np.inf
        t = int(np.argmax(lg))
        return t, max(int(nxt[st, t]), 0)

    cache = llama.KVCache.create(
        args, 1, max_seq_len=args.max_seq_len,
        dtype=kv_cache_dtype(None), layered=True,
    )
    logits, cache, _ = llama.prefill(
        params, args, cache, jnp.asarray([toks], jnp.int32)
    )
    t, st = pick(logits, 0)
    out = [t]
    pos = len(toks)
    while t not in stops and len(out) < max_gen_len:
        logits, cache = llama.decode_step(
            params, args, cache, jnp.asarray([[t]], jnp.int32), pos
        )
        t, st = pick(logits, st)
        out.append(t)
        pos += 1
    for s in stops:
        if s in out:
            out = out[: out.index(s)]
    return tok.decode(out)


def _constrained_setup(tok, seed=3, max_seq_len=192):
    from a3vlm_tpu import constrained as C

    args = ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=_padded_vocab(tok), multiple_of=16,
        max_seq_len=max_seq_len, max_batch_size=4,
    )
    params = llama.init_llama_params(jax.random.PRNGKey(seed), args)
    fsm = C.compile_grammar(C.joint_rec_grammar(), tok)
    dfa = C.CharDfa(C.Seq(C.Opt(C.Lit(" ")), C.joint_rec_grammar()))
    return args, params, fsm, dfa


_CONSTRAINED_PROMPTS = [
    "### Human: provide the joint's type and its 2D rotated bounding box",
    "detect the drawer",
    "the answer is",
    "rotated bounding box",
    "Hi my darling",
]


@pytest.mark.parametrize("temperature", [0.0, 0.8])
def test_continuous_batcher_constrained_output_parses(
    tiny_tokenizer, temperature
):
    """A content-free random model through the FSM-masked slot pool emits
    only grammar-complete joint answers (5 ragged prompts through 2 slots
    exercises queueing, batched admission, and slot reuse with per-slot
    DFA state resets); unconstrained, the same pool emits garbage."""
    tok = tiny_tokenizer
    args, params, fsm, dfa = _constrained_setup(tok)
    cb = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words, fsm=fsm
    )
    outs = cb.generate(
        _CONSTRAINED_PROMPTS, max_gen_len=64, temperature=temperature
    )
    for o in outs:
        assert dfa.matches(o), repr(o)
    free = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words
    ).generate(_CONSTRAINED_PROMPTS, max_gen_len=64)
    assert not all(dfa.matches(o) for o in free)


def test_continuous_batcher_constrained_matches_reference(tiny_tokenizer):
    """Greedy FSM-masked pool output == per-request constrained greedy
    through the plain decode path (exactness incl. admission first-token
    masking and state walks across slot reuse)."""
    tok = tiny_tokenizer
    args, params, fsm, _ = _constrained_setup(tok)
    dec = llama.unstack_layers(params)
    expected = [
        _ref_generate_fsm(
            dec, args, tok.encode(p, bos=True, eos=False), 64,
            {tok.eos_id}, fsm, tok,
        )
        for p in _CONSTRAINED_PROMPTS
    ]
    cb = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words, fsm=fsm
    )
    assert cb.generate(_CONSTRAINED_PROMPTS, max_gen_len=64) == expected


@pytest.mark.parametrize("use_prefix", [False, True])
def test_continuous_batcher_speculative_constrained(
    tiny_tokenizer, use_prefix
):
    """Speculative verify composes with the grammar mask: draft_k>0 +
    fsm emits EXACTLY the vanilla constrained greedy output (each window
    position masked by the state walked along its draft prefix), in
    fewer rounds on the templated constrained outputs."""
    tok = tiny_tokenizer
    args, params, fsm, dfa = _constrained_setup(tok, seed=7)
    pre_toks = tok.encode("### system", bos=False, eos=False)

    def run(draft_k):
        cb = ContinuousBatcher(
            params, args, tok, slots=2, vocab_limit=tok.n_words,
            fsm=fsm, draft_k=draft_k,
        )
        kw = {}
        if use_prefix:
            pre = cb.make_prefix(tokens=pre_toks)
            kw["prefixes"] = [pre] * len(_CONSTRAINED_PROMPTS)
        return cb.generate(_CONSTRAINED_PROMPTS, max_gen_len=64, **kw), cb

    expected, vanilla = run(0)
    got, spec = run(4)
    assert got == expected
    for o in got:
        assert dfa.matches(o), repr(o)
    assert spec.steps < vanilla.steps, (spec.steps, vanilla.steps)


# -- warmup -------------------------------------------------------------------


@pytest.mark.parametrize("draft_k", [0, 3])
def test_continuous_batcher_warmup_transparent(tiny_tokenizer, draft_k):
    """warmup() (pre-compiling admission/step shapes so remote TPU
    compiles never land inside a serving loop) must be OUTPUT-transparent:
    same generations as a cold pool, pool state fully reset (garbage
    warmup rows never attendable), steps counter untouched."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(4), args)
    prompts = [
        "### Human: detect all manipulable object parts",
        "the answer is",
        "rotated bounding box",
    ]

    def run(warm):
        cb = ContinuousBatcher(params, args, tok, slots=2, draft_k=draft_k)
        if warm:
            cb.warmup(buckets=(4, 8, 16), groups=(1, 2))
            assert cb.steps == 0
            assert all(a is None for a in cb._active)
            assert not cb._host_pos.any()
        return cb.generate(prompts, max_gen_len=6)

    assert run(True) == run(False)


def test_continuous_batcher_warmup_with_prefix(tiny_tokenizer):
    """prefix_len warmup fabricates a zero prefix so the _extend_jit /
    _copy_prefix shapes compile; real prefix admissions afterwards must
    be exact."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(5), args)
    pre_toks = tok.encode("### system", bos=False, eos=False)
    prompts = ["detect the drawer", "the answer is", "Hi my darling"]

    def run(warm):
        cb = ContinuousBatcher(params, args, tok, slots=2)
        pre = cb.make_prefix(tokens=pre_toks)
        if warm:
            cb.warmup(buckets=(4, 8, 16), groups=(1, 2),
                      prefix_len=pre.length)
        return cb.generate(
            prompts, max_gen_len=6, prefixes=[pre] * len(prompts)
        )

    assert run(True) == run(False)


def test_chunked_dispatch_matches_per_step(tiny_tokenizer):
    """steps_per_dispatch=3 (multi-step in-jit decode rounds): greedy
    output is EXACTLY the per-step path's — slots stop mid-chunk on stop
    tokens / ragged gen limits, and re-admissions land at chunk
    boundaries without corrupting anything."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(6), args)
    prompts = [
        "### Human: detect all manipulable object parts",
        "the answer is",
        "provide the joint's type",
        "rotated bounding box",
        "Hi my darling",
    ]
    glens = [3, 6, 9, 5, 7]  # ragged so slots finish mid-chunk

    ref_b = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words, seed=4
    )
    ref = ref_b.generate(prompts, max_gen_len=glens)

    chunk_b = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words, seed=4,
        steps_per_dispatch=3,
    )
    got = chunk_b.generate(prompts, max_gen_len=glens)
    assert got == ref
    assert chunk_b.steps % 3 == 0


def test_chunked_dispatch_sampled_reproducible(tiny_tokenizer):
    """Sampled chunked decoding: same seed -> same output, emitted ids
    inside vocab_limit. (Sampled output may differ from the per-step
    path's — admission GROUPING already shifts the shared rng stream at
    temperature>0, exactly like batched admission does today — so the
    invariant is reproducibility, not cross-chunk-size identity.)"""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(6), args)
    prompts = ["detect parts", "### Human: hi", "the answer is"]

    def run():
        return ContinuousBatcher(
            params, args, tok, slots=2, vocab_limit=tok.n_words, seed=9,
            steps_per_dispatch=3,
        ).generate(prompts, max_gen_len=6, temperature=0.8, top_p=0.9)

    out_a, out_b = run(), run()
    assert out_a == out_b
    for o in out_a:
        ids = tok.encode(o, bos=False, eos=False)
        assert all(i < tok.n_words for i in ids)


def test_chunked_dispatch_constrained_matches(tiny_tokenizer):
    """steps_per_dispatch composes with grammar constraints: the in-jit
    DFA walk reproduces the per-step constrained output."""
    tok = tiny_tokenizer
    args, params, fsm, _ = _constrained_setup(tok)
    ref = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words, fsm=fsm
    ).generate(_CONSTRAINED_PROMPTS, max_gen_len=24)
    got = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words, fsm=fsm,
        steps_per_dispatch=4,
    ).generate(_CONSTRAINED_PROMPTS, max_gen_len=24)
    assert got == ref


def test_chunked_dispatch_warmup_transparent(tiny_tokenizer):
    """warmup() with steps_per_dispatch>1 compiles the chunk step and
    leaves outputs unchanged."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(6), args)
    prompts = ["detect parts", "### Human: hi"]
    plain = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words,
        steps_per_dispatch=3,
    ).generate(prompts, max_gen_len=6)
    warm = ContinuousBatcher(
        params, args, tok, slots=2, vocab_limit=tok.n_words,
        steps_per_dispatch=3,
    )
    warm.warmup(buckets=(16,), groups=(1, 2))
    assert warm.generate(prompts, max_gen_len=6) == plain


def test_prefix_cached_admission_mp2_matches_single(devices8,
                                                    tiny_tokenizer):
    """Prefix-cached admissions on a (data=4, model=2) mesh (sharded
    params + pooled cache) reproduce the unsharded prefix-cached outputs
    — the best serving configuration (KV-prefix reuse) must be exact
    under TP, not just compile (round-5 dryrun leg's CPU exactness
    twin)."""
    import dataclasses

    from a3vlm_tpu.models import ens5
    from a3vlm_tpu.parallel import create_mesh, shard_params

    tok = tiny_tokenizer
    cfg = ens5.tiny_ens5_config(vocab_size=_padded_vocab(tok))
    args = cfg.llama.replace(max_seq_len=256)
    cfg = dataclasses.replace(cfg, llama=args)
    params = ens5.init_ens5_params(jax.random.PRNGKey(11), cfg)
    rng = np.random.default_rng(11)
    image = rng.uniform(size=(cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    prompts = ["### Human: status of the door?", "detect parts",
               "provide the joint type"]
    max_gen = 5

    ref_cb = ContinuousBatcher(
        params["llama"], args, tok, slots=2, max_seq_len=256,
        ens5_params=params, ens5_cfg=cfg, vocab_limit=tok.n_words,
    )
    ref = ref_cb.generate(
        prompts, max_gen_len=max_gen,
        prefixes=[ref_cb.make_prefix(image=image)] * 3,
    )

    mesh = create_mesh(2, devices=devices8)
    sharded_llama = shard_params(
        params["llama"], mesh, llama.llama_partition_specs(args)
    )
    sharded = {**params, "llama": sharded_llama}
    cb = ContinuousBatcher(
        sharded_llama, args, tok, slots=2, max_seq_len=256,
        ens5_params=sharded, ens5_cfg=cfg, vocab_limit=tok.n_words,
        mesh=mesh,
    )
    got = cb.generate(
        prompts, max_gen_len=max_gen,
        prefixes=[cb.make_prefix(image=image)] * 3,
    )
    assert got == ref
