"""Batched KV-cached generation, reproducing MetaModel.generate semantics
(reference model/accessory/model/meta.py:379-485) as a single jit-compiled
``lax.while_loop`` — no per-token host round-trips:

- prompts right-padded; generation starts after a static-length prefill and
  passes prompt tokens through instead of sampled ones while inside each
  element's prompt (meta.py:463-465).
- greedy when temperature == 0, top-p sampling otherwise (meta.py:456-461).
- multi-token stop sequences checked per batch element each step; stop_pos
  records where the match began (meta.py:439-477). EOS is always a stop.
- with images, KV-cache positions of text tokens are offset by ``image_words``
  (llama_ens5.py:513-521).

Static-shape policy: the prefill length is the largest power of two <=
min_prompt_len (bounded recompile count); the loop itself is fully traced with
an early-exit condition when every element has stopped.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Iterable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import llama
from a3vlm_tpu.ops.sampling import sample_token


@dataclass(frozen=True)
class GenerationResult:
    tokens: np.ndarray  # [B, total_len]
    stop_pos: np.ndarray  # [B]


class GenOps(NamedTuple):
    """Decoder-family generation hooks (static under jit — use module-level
    functions). Defaults are the llama core; falcon provides its own."""

    create_cache: Callable  # (args, batch, max_seq_len, dtype) -> cache
    prefill: Callable  # (params, args, cache, tokens, image_tokens, impl)
    decode_step: Callable  # (params, args, cache, token, seq_pos, impl)
    # (args, mesh, batch, quant=False) -> pytree of PartitionSpec matching
    # create_cache's output; used to shard the KV cache for multi-chip decode
    cache_specs: Optional[Callable] = None
    # optional memory-bounded prefill (llama.prefill_chunked signature):
    # (params, args, cache, tokens, image_tokens, chunk, impl)
    prefill_chunked: Optional[Callable] = None


def _llama_create_cache(args, batch, max_seq_len, dtype):
    # layered (per-layer buffer) cache: in-place decode updates (llama.py
    # KVCache docstring; ~2.2x faster decode than the stacked layout)
    return llama.KVCache.create(args, batch, max_seq_len=max_seq_len,
                                dtype=dtype, layered=True)


def _llama_prefill(params, args, cache, tokens, image_tokens, impl):
    return llama.prefill(params, args, cache, tokens,
                         image_tokens=image_tokens, impl=impl)


def _llama_decode_step(params, args, cache, token, seq_pos, impl):
    return llama.decode_step(params, args, cache, token, seq_pos, impl=impl)


def _llama_prefill_chunked(params, args, cache, tokens, image_tokens,
                           chunk, impl):
    return llama.prefill_chunked(params, args, cache, tokens,
                                 image_tokens=image_tokens, chunk=chunk,
                                 impl=impl)


LLAMA_GEN_OPS = GenOps(
    _llama_create_cache, _llama_prefill, _llama_decode_step,
    llama.decode_cache_specs, _llama_prefill_chunked,
)


def _falcon_create_cache(args, batch, max_seq_len, dtype):
    from a3vlm_tpu.models import falcon

    return falcon.FalconKVCache.create(args, batch, max_seq_len=max_seq_len,
                                       dtype=dtype, layered=True)


def _falcon_prefill(params, args, cache, tokens, image_tokens, impl):
    from a3vlm_tpu.models import falcon

    assert image_tokens is None, "falcon is text-only (falcon.py:302)"
    return falcon.prefill(params, args, cache, tokens)


def _falcon_decode_step(params, args, cache, token, seq_pos, impl):
    from a3vlm_tpu.models import falcon

    return falcon.decode_step(params, args, cache, token, seq_pos)


def _falcon_cache_specs(args, mesh, batch, quant=False):
    from jax.sharding import PartitionSpec as P

    axes = dict(mesh.shape)
    b_ax = "data" if batch % axes.get("data", 1) == 0 else None
    h_ax = "model" if args.kv_heads % axes.get("model", 1) == 0 else None
    spec = P(b_ax, h_ax, None, None)  # layered buffers are [B, Hkv, S, D]
    if quant:
        from a3vlm_tpu.ops.decode_attention import quantized_kv_spec

        spec = quantized_kv_spec(b_ax, h_ax)
    per_layer = tuple(spec for _ in range(args.num_layers))
    from a3vlm_tpu.models.falcon import FalconKVCache

    return FalconKVCache(per_layer, per_layer)


FALCON_GEN_OPS = GenOps(
    _falcon_create_cache, _falcon_prefill, _falcon_decode_step,
    _falcon_cache_specs,
)


def _prefill_bucket(min_prompt: int) -> int:
    p = 1
    while p * 2 <= min_prompt:
        p *= 2
    return p


@functools.partial(
    jax.jit,
    static_argnames=(
        "args",
        "total_len",
        "temperature",
        "top_p",
        "stop_tokens",
        "impl",
        "vocab_limit",
        "params_transform",
        "ops",
        "prefill_chunk",
    ),
    donate_argnames=("cache",),
)
def _generate_loop(
    params,
    args: ModelArgs,
    cache: llama.KVCache,
    tokens: jnp.ndarray,  # [B, total_len]
    input_text_mask: jnp.ndarray,  # [B, total_len]
    prefill_tokens: jnp.ndarray,  # [B, P] (static P)
    image_tokens: Optional[jnp.ndarray],
    rng: jax.Array,
    total_len: int,
    temperature: float,
    top_p: float,
    stop_tokens: tuple[tuple[int, ...], ...],
    impl: str = "auto",
    vocab_limit: Optional[int] = None,
    params_transform=None,
    ops: GenOps = LLAMA_GEN_OPS,
    prefill_chunk: Optional[int] = None,
    fsm_next: Optional[jnp.ndarray] = None,
):
    if params_transform is not None:
        # e.g. quant.dequantize_params: runs INSIDE jit so XLA fuses the
        # int8/int4 dequant into the matmuls (weights stay quantized in HBM)
        params = params_transform(params)
    B, P = prefill_tokens.shape
    image_words = 0 if image_tokens is None else image_tokens.shape[1]

    # pure-greedy fast path (static: temperature and fsm are trace-time):
    # the rng split chain and the [B, V] pad-mask `where` are dead work —
    # a truncated argmax over the true vocab picks the identical token,
    # and no keys are consumed. Exact same outputs as the general path.
    greedy_nofsm = temperature <= 0.0 and fsm_next is None

    def mask_pad_vocab(lg):
        # lane-padded vocab entries must never be sampled (the greedy
        # fast path covers this by truncating the argmax instead)
        if greedy_nofsm:
            return lg
        if vocab_limit is not None and vocab_limit < lg.shape[-1]:
            return jnp.where(
                jnp.arange(lg.shape[-1]) >= vocab_limit, -1e30, lg
            )
        return lg

    def pick_token(sub, lg):
        if greedy_nofsm:
            if vocab_limit is not None and vocab_limit < lg.shape[-1]:
                lg = lg[:, :vocab_limit]
            return jnp.argmax(lg, axis=-1).astype(jnp.int32)
        return sample_token(sub, lg, temperature, top_p)

    if prefill_chunk and ops.prefill_chunked is not None:
        # memory-bounded prefill for long prompts/large batches (the
        # one-shot unrolled prefill's activation temps are O(S * layers))
        logits, cache, _ = ops.prefill_chunked(
            params, args, cache, prefill_tokens, image_tokens,
            prefill_chunk, impl
        )
    else:
        logits, cache, _ = ops.prefill(
            params, args, cache, prefill_tokens, image_tokens, impl
        )
    logits = mask_pad_vocab(logits)

    start_pos = P
    stopped = jnp.zeros((B,), bool)
    stop_pos = jnp.full((B,), start_pos + 1, jnp.int32)

    def cond(state):
        cur_pos, _, _, stopped, _, _, _, _ = state
        return (cur_pos < total_len) & ~jnp.all(stopped)

    def body(state):
        cur_pos, tokens, cache, stopped, stop_pos, logits, rng, fstate = state
        if temperature <= 0.0:
            sub = rng  # greedy consumes no keys (matches the lookup path)
        else:
            rng, sub = jax.random.split(rng)
        if fsm_next is not None:
            # grammar mask: tokens that would kill the answer DFA (or EOS
            # outside an accepting state) can never be sampled
            # (a3vlm_tpu.constrained). One [B]-row gather per step.
            row = fsm_next[fstate]  # [B, V] int
            logits = jnp.where(row >= 0, logits, -1e30)
        next_token = pick_token(sub, logits)
        in_prompt = jax.lax.dynamic_slice_in_dim(
            input_text_mask, cur_pos, 1, axis=1
        )[:, 0]
        prompt_tok = jax.lax.dynamic_slice_in_dim(tokens, cur_pos, 1, axis=1)[:, 0]
        next_token = jnp.where(in_prompt, prompt_tok, next_token)
        tokens = jax.lax.dynamic_update_slice(
            tokens, next_token[:, None], (0, cur_pos)
        )

        stop_pos = jnp.where(stopped, stop_pos, cur_pos + 1)
        for st in stop_tokens:
            L = len(st)
            window_start = jnp.maximum(cur_pos + 1 - L, 0)
            window = jax.lax.dynamic_slice(
                tokens, (0, window_start), (B, L)
            )
            matched = jnp.all(window == jnp.asarray(st, tokens.dtype)[None], axis=1)
            matched &= (cur_pos + 1 - L) >= 0
            new_stop = matched & ~in_prompt & ~stopped
            stop_pos = jnp.where(new_stop, cur_pos + 1 - L, stop_pos)
            stopped = stopped | new_stop

        if fsm_next is not None:
            # advance per-row DFA state on GENERATED tokens only (prompt
            # forcing and post-stop sampling never move the grammar)
            nf = fsm_next[fstate, next_token].astype(fstate.dtype)
            fstate = jnp.where(
                in_prompt | stopped, fstate, jnp.maximum(nf, 0)
            )

        logits, cache = ops.decode_step(
            params, args, cache, next_token[:, None],
            cur_pos + image_words, impl,
        )
        logits = mask_pad_vocab(logits)
        return (cur_pos + 1, tokens, cache, stopped, stop_pos, logits, rng,
                fstate)

    fstate0 = jnp.zeros((B,), jnp.int32)
    state = (jnp.int32(start_pos), tokens, cache, stopped, stop_pos, logits,
             rng, fstate0)
    _, tokens, cache, stopped, stop_pos, _, _, _ = jax.lax.while_loop(
        cond, body, state)
    # elements that never hit a stop keep the final stop_pos (== last filled+1).
    # The cache is RETURNED (and dropped by the caller) so the donated input
    # gets an output alias: an unmatched donation is silently dropped, and the
    # first prefill write then COPIES the whole zero cache — a transient 2x
    # cache HBM spike per generate() call (2.7 GB at batch-16 kv8 S=640; this
    # is what OOMed cb_bench's static-wave leg next to the int4 weights).
    return tokens, stop_pos, cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "args",
        "gen_len",
        "draft_k",
        "impl",
        "vocab_limit",
        "params_transform",
        "ops",
        "prefill_chunk",
        "stop_token",
        "temperature",
        "top_p",
        "key_offset",
        "lookup_max_n",
    ),
    donate_argnames=("cache",),
)
def _lookup_generate_loop(
    params,
    args: ModelArgs,
    cache: llama.KVCache,
    prompt_tokens,  # [1, P] int32 (exact length — no bucketing)
    image_tokens,
    *,
    gen_len: int,
    draft_k: int,
    impl: str,
    vocab_limit: Optional[int],
    params_transform,
    ops: GenOps,
    prefill_chunk: Optional[int],
    stop_token: int,
    fsm_next=None,
    temperature: float = 0.0,
    top_p: float = 0.95,
    rng=None,
    key_offset: int = 0,
    lookup_max_n: int = 4,
):
    """Whole-query jit for the batch-1 prompt-lookup speculative path:
    prefill the FULL prompt, then lookup_decode.lookup_generate. Output
    tokens equal vanilla greedy exactly (lookup_decode's contract) —
    grammar-constrained greedy when ``fsm_next`` is set (the first token
    is masked at DFA state 0, matching _generate_loop's fstate0). With
    ``temperature > 0`` the vanilla loop's rng split chain is precomputed
    into a per-emitted-index key table, so the sampled output is
    BIT-IDENTICAL to _generate_loop with the same seed."""
    from a3vlm_tpu.lookup_decode import lookup_generate

    if params_transform is not None:
        params = params_transform(params)
    if prefill_chunk and ops.prefill_chunked is not None:
        logits, cache, _ = ops.prefill_chunked(
            params, args, cache, prompt_tokens, image_tokens, prefill_chunk,
            impl,
        )
    else:
        logits, cache, _ = ops.prefill(
            params, args, cache, prompt_tokens, image_tokens, impl
        )
    if vocab_limit is not None and vocab_limit < logits.shape[-1]:
        logits = jnp.where(
            jnp.arange(logits.shape[-1]) >= vocab_limit, -1e30, logits
        )
    fsm_state0 = None
    if fsm_next is not None:
        logits = jnp.where(fsm_next[0][None] >= 0, logits, -1e30)
    sample_keys = None
    if temperature > 0.0:
        # reproduce _generate_loop's per-step `rng, sub = split(rng)`
        # chain positionally: the vanilla loop starts at the PREFILL
        # BUCKET and consumes one key per in-prompt step before the first
        # token is actually generated, so emitted token t is sampled with
        # sub_{key_offset + t} (key_offset = prompt_len - bucket). The
        # lookup path prefills the full prompt, so we burn those keys here.
        def _mk(r, _):
            r, s = jax.random.split(r)
            return r, s

        _, sample_keys = jax.lax.scan(
            _mk, rng, None, length=key_offset + gen_len + draft_k
        )
        sample_keys = sample_keys[key_offset:]
        first = sample_token(
            sample_keys[0], logits, temperature, top_p
        ).astype(jnp.int32)[0]
    else:
        first = jnp.argmax(logits, -1).astype(jnp.int32)[0]
    if fsm_next is not None:
        fsm_state0 = jnp.maximum(fsm_next[0, first], 0)
    W = 0 if image_tokens is None else image_tokens.shape[1]
    P = prompt_tokens.shape[1]
    return lookup_generate(
        params, args, cache, prompt_tokens[0], P + W, first,
        gen_len=gen_len, draft_k=draft_k, vocab_limit=vocab_limit,
        stop_token=stop_token, fsm_next=fsm_next, fsm_state0=fsm_state0,
        temperature=temperature, top_p=top_p, sample_keys=sample_keys,
        max_n=lookup_max_n,
    )


class Generator:
    """Host-side orchestration: tokenize prompts, build static-shape buffers,
    run the device loop, trim and decode."""

    def __init__(
        self, params, args: ModelArgs, tokenizer, image_words: int = 0,
        vocab_limit: Optional[int] = None, params_transform=None,
        ops: GenOps = LLAMA_GEN_OPS, mesh=None,
        kv_cache_bits: Optional[int] = None,
        prefill_chunk: Optional[int] = None,
    ):
        # decode layout: per-layer weight buffers — slicing stacked [L, ...]
        # weights inside the token loop makes XLA copy every weight every
        # step (llama.unstack_layers docstring). One-time restructure.
        self.params = llama.unstack_layers(params)
        self.args = args
        self.tokenizer = tokenizer
        self.image_words = image_words
        self.vocab_limit = vocab_limit
        self.params_transform = params_transform
        self.ops = ops
        # multi-chip serving (the reference's MP=2 TP-lockstep generation,
        # eval_affordance_v2.py:330-384): with a mesh, the KV cache is
        # sharded batch-on-"data" / kv-heads-on-"model" and the token
        # buffers batch-on-"data"; XLA turns the per-layer TP matmuls into
        # ICI collectives via the params' NamedShardings.
        self.mesh = mesh
        # set by _generate_lookup (draft_k > 0): realized speculative
        # acceptance for the LAST request — emitted tokens, verify rounds
        self.last_spec_stats = None
        # 8 -> int8 KV cache with per-token scales (halves decode cache
        # traffic / doubles capacity; ops/decode_attention.QuantizedKV).
        # NOTE: the traffic win needs the fused q8 kernels (D % 128 == 0);
        # on kernel-ineligible shapes (falcon's D=64) decode falls back to
        # dequantizing the panels per step — capacity still halves, but
        # per-step traffic is then ~2x a plain bf16 cache.
        assert kv_cache_bits in (None, 8), kv_cache_bits
        self.kv_cache_bits = kv_cache_bits
        # chunked prefill: bound activation temps for long prompts
        self.prefill_chunk = prefill_chunk

    def _shard_cache(self, cache, batch):
        if self.mesh is None or self.ops.cache_specs is None:
            return cache
        from jax.sharding import NamedSharding

        specs = self.ops.cache_specs(
            self.args, self.mesh, batch, quant=self.kv_cache_bits == 8
        )
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            cache, specs,
        )

    def _shard_batched(self, x):
        """Place a [B, ...] host buffer on the mesh, batch over "data" when
        it divides, replicated otherwise."""
        x = jnp.asarray(x)
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = dict(self.mesh.shape).get("data", 1)
        b_ax = "data" if x.shape[0] % dp == 0 else None
        spec = P(b_ax, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def generate(
        self,
        prompts: Sequence[str],
        image_tokens: Optional[jnp.ndarray] = None,
        max_gen_len: int = 512,
        temperature: float = 0.0,
        top_p: float = 0.95,
        additional_stop_symbols: Iterable[str] = (),
        seed: int = 0,
        impl: str = "auto",
        fsm=None,
        draft_k: int = 0,
        lookup_max_n: int = 4,
    ) -> list[str]:
        """``fsm``: a ``constrained.TokenFsm`` — every generated token is
        masked to the answer grammar (malformed triads become impossible;
        EOS only in accepting states). Works with greedy and top-p.

        ``draft_k``: batch-1 requests route through prompt-lookup
        speculative decoding (lookup_decode) — output text is EXACTLY the
        vanilla loop's output (measured 540 -> 330 ms image->triad p50 on
        loopy triad answers). Composes with ``fsm`` (verify windows are
        grammar-masked per position, drafts repaired to legal tokens;
        output equals constrained greedy exactly, and grammar structure
        raises draft acceptance) and with ``temperature > 0`` (each
        verify position uses the vanilla loop's own per-step rng key, so
        the sampled output is bit-identical for the same seed — not just
        distribution-equal). Silently falls back to the vanilla loop when
        ineligible (batch > 1, non-llama ops). The lookup path compiles
        per (prompt_len, gen_len) — it is the latency-oriented
        single-query mode, not the bucketed eval mode."""
        if isinstance(prompts, str):
            raise ValueError("generate expects a batched LIST of prompts")
        bsz = len(prompts)
        args = self.args
        assert bsz <= args.max_batch_size, (bsz, args.max_batch_size)

        tok = self.tokenizer
        prompt_tokens = [tok.encode(x, bos=True, eos=False) for x in prompts]

        max_seq_len = args.max_seq_len
        if image_tokens is not None:
            max_seq_len -= self.image_words

        # left-truncate prompts, leaving room for generation (meta.py:427-429)
        prompt_tokens = [t[-(max_seq_len - max_gen_len):] for t in prompt_tokens]
        min_prompt = min(len(t) for t in prompt_tokens)
        max_prompt = max(len(t) for t in prompt_tokens)
        total_len = min(max_seq_len, max_gen_len + max_prompt)

        tokens = np.zeros((bsz, total_len), np.int32)
        mask = np.zeros((bsz, total_len), bool)
        for i, t in enumerate(prompt_tokens):
            tokens[i, : len(t)] = t
            mask[i, : len(t)] = True

        stop_tok: list[tuple[int, ...]] = [(tok.eos_id,)]
        for sym in additional_stop_symbols:
            stop_tok.append(tuple(tok.encode_segment(sym)))
            stop_tok.append(tuple(tok.encode_wo_prefix_space(sym)))
        stop_tokens = tuple(dict.fromkeys(stop_tok))  # dedup, keep order

        fsm_next = None
        if fsm is not None:
            nxt = fsm.next_state
            pad = args.vocab_size - nxt.shape[1]
            assert pad >= 0, (nxt.shape, "fsm table wider than logits")
            if pad:  # lane-padded vocab tail: never legal
                nxt = np.pad(nxt, ((0, 0), (0, pad)), constant_values=-1)
            fsm_next = jnp.asarray(np.ascontiguousarray(nxt, np.int32))
            if self.mesh is not None:
                from jax.sharding import (
                    NamedSharding, PartitionSpec as PS,
                )

                fsm_next = jax.device_put(
                    fsm_next, NamedSharding(self.mesh, PS(None, None))
                )

        if (
            draft_k
            and bsz == 1
            and self.ops is LLAMA_GEN_OPS
        ):
            return self._generate_lookup(
                prompt_tokens[0], image_tokens, max_gen_len, stop_tokens,
                draft_k, impl, fsm_next=fsm_next,
                temperature=temperature, top_p=top_p, seed=seed,
                lookup_max_n=lookup_max_n,
            )

        P = _prefill_bucket(min_prompt)
        cache_len = total_len + (0 if image_tokens is None else self.image_words)
        from a3vlm_tpu.ops.decode_attention import kv_cache_dtype

        cache = self.ops.create_cache(
            args, bsz, cache_len, kv_cache_dtype(self.kv_cache_bits)
        )
        cache = self._shard_cache(cache, bsz)
        if image_tokens is not None:
            image_tokens = self._shard_batched(image_tokens)

        out_tokens, stop_pos, _cache_out = _generate_loop(
            self.params,
            args,
            cache,
            self._shard_batched(tokens),
            self._shard_batched(mask),
            self._shard_batched(tokens[:, :P]),
            image_tokens,
            jax.random.PRNGKey(seed),
            total_len=total_len,
            temperature=temperature,
            top_p=top_p,
            stop_tokens=stop_tokens,
            impl=impl,
            vocab_limit=self.vocab_limit,
            params_transform=self.params_transform,
            prefill_chunk=self.prefill_chunk,
            ops=self.ops,
            fsm_next=fsm_next,
        )
        out_tokens = np.asarray(out_tokens)
        stop_pos = np.asarray(stop_pos)

        decoded = []
        for i in range(bsz):
            t = out_tokens[i, len(prompt_tokens[i]) : stop_pos[i]].tolist()
            decoded.append(tok.decode(t))
        return decoded

    def _generate_lookup(self, t, image_tokens, max_gen_len, stop_tokens,
                         draft_k, impl, fsm_next=None,
                         temperature: float = 0.0, top_p: float = 0.95,
                         seed: int = 0, lookup_max_n: int = 4):
        """Batch-1 greedy generation through prompt-lookup speculation.
        The device loop stops on EOS only; multi-token stop sequences are
        matched HERE with the vanilla loop's exact window semantics
        (suffix match ending at a generated position, cut at match start
        — windows may straddle the prompt boundary), so the returned text
        equals the vanilla path's."""
        args = self.args
        tok = self.tokenizer
        max_seq_len = args.max_seq_len
        if image_tokens is not None:
            max_seq_len -= self.image_words
        total_len = min(max_seq_len, max_gen_len + len(t))
        gen_len = total_len - len(t)
        W = 0 if image_tokens is None else self.image_words
        from a3vlm_tpu.ops.decode_attention import kv_cache_dtype

        # lookup's last verify window writes up to draft_k rows past the
        # final emitted position (lookup_generate docstring)
        cache = self.ops.create_cache(
            args, 1, total_len + W + draft_k + 1,
            kv_cache_dtype(self.kv_cache_bits),
        )
        cache = self._shard_cache(cache, 1)
        if image_tokens is not None:
            image_tokens = self._shard_batched(image_tokens)
        prompt = self._shard_batched(np.asarray([t], np.int32))
        out, count, _cache, rounds = _lookup_generate_loop(
            self.params, args, cache, prompt, image_tokens,
            gen_len=gen_len, draft_k=draft_k, impl=impl,
            vocab_limit=self.vocab_limit,
            params_transform=self.params_transform, ops=self.ops,
            prefill_chunk=self.prefill_chunk, stop_token=tok.eos_id,
            fsm_next=fsm_next, temperature=temperature, top_p=top_p,
            rng=jax.random.PRNGKey(seed),
            key_offset=len(t) - _prefill_bucket(len(t)),
            lookup_max_n=lookup_max_n,
        )
        gen = np.asarray(out)[: int(count)].tolist()
        # realized acceptance telemetry (scripts/spec_acceptance.py): how
        # many verify forwards the emitted tokens actually cost
        self.last_spec_stats = {
            "emitted": int(count),
            "verify_rounds": int(rounds),
            "tokens_per_round": round(int(count) / max(int(rounds), 1), 3),
        }
        buf = list(t) + gen
        P = len(t)
        cut = len(gen)
        for j in range(len(gen)):  # earliest stop wins, like the loop
            cur = P + j
            for st in stop_tokens:
                L = len(st)
                start = cur + 1 - L
                if start >= 0 and tuple(buf[start : cur + 1]) == st:
                    cut = min(cut, max(start - P, 0))
                    break
            if cut < len(gen):
                break
        return [tok.decode(gen[:cut])]
