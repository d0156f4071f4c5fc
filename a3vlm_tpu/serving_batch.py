"""Continuous batching for serving — a TPU-native extension beyond the
reference (its server decodes lockstep batches only,
multi_gpu_wrapper.py:260-320; eval_affordance_v2.py:330-384 waits for the
whole batch to finish before admitting more work).

Design: a fixed pool of B cache SLOTS over one layered bhsd KV cache
(static shapes — nothing recompiles as requests come and go):

- admission: a free slot prefills its request (batch-1 prefill into a
  temp cache sized to the prompt) and the panels are scattered into the
  slot's rows of the pooled cache. When several slots free at once,
  same-bucket admissions run as ONE batched prefill (``_admit_many`` —
  B requests stream the weights once instead of B times; the start of an
  eval group admits ~12 same-prefix questions together).
- decode: ONE jitted ragged step advances every slot per iteration
  (`llama.decode_step_ragged` — per-slot positions/valid lengths; the
  decode-attention kernel takes per-row valid natively, so ragged costs
  nothing extra).
- completion: a slot that hits EOS/max length is freed and the next
  queued request admitted between steps. Finished slots keep riding the
  batched step (they rewrite their own last cache row; rows beyond a
  slot's valid length are never attended), which is the standard
  idle-slot tradeoff.

Greedy decoding (the eval CLI's temperature-0 path); cache rows beyond a
request's extent are always overwritten before they become attendable, so
slot reuse needs no cache zeroing.
"""

from __future__ import annotations

import functools
import time
from collections import deque
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import llama
from a3vlm_tpu.ops.decode_attention import kv_cache_dtype
from a3vlm_tpu.ops.sampling import sample_top_p


def _pick(logits, rng, vocab_limit, temperature, top_p, fsm_rows=None):
    """Greedy or top-p selection with the padded-vocab tail masked
    (MetaModel lane-pads the vocab; tail logits must never win).
    ``fsm_rows``: grammar transition rows broadcastable to ``logits``
    (-1 = token forbidden by the answer DFA, a3vlm_tpu.constrained)."""
    if fsm_rows is not None:
        logits = jnp.where(fsm_rows >= 0, logits, -1e30)
    if vocab_limit is not None and vocab_limit < logits.shape[-1]:
        logits = logits.at[:, vocab_limit:].set(-jnp.inf)
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    return sample_top_p(rng, probs, top_p).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("args", "vocab_limit", "temperature", "top_p"),
    donate_argnames=("cache",),
)
def _ragged_step(params, args, cache, token, pos, rng, vocab_limit,
                 temperature, top_p, fsm_table=None, fsm_state=None):
    logits, cache = llama.decode_step_ragged(params, args, cache, token, pos)
    rows = None if fsm_table is None else fsm_table[fsm_state]  # [B, V]
    return _pick(logits, rng, vocab_limit, temperature, top_p, rows), cache


@functools.partial(
    jax.jit,
    static_argnames=("args", "vocab_limit", "temperature", "top_p",
                     "t_steps", "pos_cap"),
    donate_argnames=("cache",),
)
def _ragged_step_chunk(params, args, cache, token, pos, active, remaining,
                       stop_tokens, rng, vocab_limit, temperature, top_p,
                       t_steps, pos_cap, fsm_table=None, fsm_state=None):
    """``t_steps`` vanilla ragged decode steps in ONE dispatch — the
    round-4 fix for relay-latency-bound serving: the per-step host loop
    pays ~3 synchronous host<->device round trips (~27 ms each on the
    axon relay) per ~10 ms compute step, which benched continuous
    batching at 0.46x static waves on-chip. Tokens, positions, EOS flags
    and grammar states ride the loop carry on device; the host reads back
    ONE [B, T] token block per chunk.

    GREEDY output is EXACTLY the per-step path's: slots stop emitting
    in-loop on stop tokens / gen limits / the position cap (mirroring the
    host bookkeeping) and frozen slots idempotently rewrite their own
    cache row. The rng splits once per step only while any slot emits, so
    the DECODE split sequence matches the per-step path — but sampled
    output may still differ across chunk sizes because admission timing
    (which shares the stream) shifts to chunk boundaries, exactly like
    batched-admission grouping already does at temperature>0. Sampled
    runs are seed-reproducible, not scheduling-invariant.

    ``active`` [B] bool, ``remaining`` [B] int32 (tokens each slot may
    still emit), ``stop_tokens`` [n] int32. Returns
    (tokens [B, t_steps] int32, rng', cache)."""
    B = token.shape[0]

    def body(i, carry):
        token, pos, active, remaining, rng, fsm_state, toks, cache = carry
        emit = active & (remaining > 0)
        rng, sub = jax.lax.cond(
            jnp.any(emit),
            lambda r: tuple(jax.random.split(r)),
            lambda r: (r, r),
            rng,
        )
        logits, cache = llama.decode_step_ragged(
            params, args, cache, token, pos
        )
        rows = None if fsm_table is None else fsm_table[fsm_state]
        pick = _pick(logits, sub, vocab_limit, temperature, top_p, rows)
        nxt = jnp.where(emit, pick, token[:, 0])
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, i))
        if fsm_table is not None:
            walked = jnp.maximum(
                fsm_table[fsm_state, nxt], 0
            ).astype(fsm_state.dtype)
            fsm_state = jnp.where(emit, walked, fsm_state)
        hit_stop = jnp.any(
            nxt[:, None] == stop_tokens[None, :], axis=-1
        )
        remaining = remaining - emit.astype(remaining.dtype)
        pos = pos + emit.astype(pos.dtype)
        capped = pos + 1 >= pos_cap
        active = emit & ~hit_stop & (remaining > 0) & ~capped
        return (nxt[:, None], pos, active, remaining, rng, fsm_state,
                toks, cache)

    toks0 = jnp.zeros((B, t_steps), jnp.int32)
    out = jax.lax.fori_loop(
        0, t_steps, body,
        (token, pos, active, remaining, rng, fsm_state, toks0, cache),
    )
    return out[6], out[4], out[7]


@functools.partial(
    jax.jit,
    static_argnames=("args", "vocab_limit"),
    donate_argnames=("cache",),
)
def _ragged_verify_step(params, args, cache, tokens, pos, vocab_limit,
                        fsm_table=None, fsm_states=None):
    """Speculative verify round (greedy only): ``tokens`` [B, K+1] =
    [current token | K drafted tokens] per slot; returns the greedy
    prediction at every window position ([B, K+1] int32 — tiny host
    readback instead of [B, K+1, V] logits over the relay) and the
    cache with all K+1 rows written. ``fsm_states`` [B, K+1]: the grammar
    state each window position's pick must respect (host-walked along the
    draft; positions past the first illegal draft are never accepted, so
    their clamped states are don't-cares)."""
    logits, cache = llama.decode_step_ragged_multi(
        params, args, cache, tokens, pos
    )
    if fsm_table is not None:
        rows = fsm_table[fsm_states]  # [B, K+1, V]
        logits = jnp.where(rows >= 0, logits, -1e30)
    if vocab_limit is not None and vocab_limit < logits.shape[-1]:
        logits = logits.at[..., vocab_limit:].set(-jnp.inf)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


def _lookup_draft(ctx: list[int], k: int, max_n: int = 4) -> list[int]:
    """Host-side prompt-lookup drafting: find the most recent EARLIER
    occurrence of the LONGEST current suffix n-gram (n = max_n .. 1) in
    the slot's token history and propose the ``k`` tokens that followed
    it. Longer matched context disambiguates repeats — on the templated
    triad outputs a bigram like ", 0" recurs in many positions while the
    4-gram pins the right one, so accepted-prefix lengths go up at zero
    verify cost (the verify window is ``k`` wide either way; output stays
    exactly greedy because every draft token is verified). No match at
    any n -> repeat the last token (harmless: accepted=0 still emits the
    one verified token)."""
    n = len(ctx)
    last = ctx[-1]
    if n >= 2:
        a = np.asarray(ctx, np.int64)
        for m in range(min(max_n, n - 1), 0, -1):
            suf = a[n - m :]
            # windows over a[:-1]: match starts i <= n-1-m, so the
            # continuation start i+m <= n-1 is strictly earlier than the
            # suffix's own occurrence (the bigram rule, generalized)
            win = np.lib.stride_tricks.sliding_window_view(a[:-1], m)
            hits = np.flatnonzero((win == suf).all(axis=1))
            if hits.size:
                start = int(hits[-1]) + m
                draft = ctx[start : start + k]
                if len(draft) < k:
                    draft = draft + [last] * (k - len(draft))
                return draft
    return [last] * k


def _bucket(n: int) -> int:
    """Admission length bucket: next power of two (min 16). Compiles are
    20-120 s each over the TPU relay, so shapes must be bounded — raw
    per-length jits would dwarf the prefix-caching savings on real task
    JSONs (ragged question lengths)."""
    b = 16
    while b < n:
        b *= 2
    return b


@functools.partial(
    jax.jit,
    static_argnames=("args", "vocab_limit", "temperature", "top_p"),
)
def _prefill_jit(params, args, cache, tokens, image_tokens, last_idx, rng,
                 vocab_limit, temperature, top_p, fsm_row=None):
    """Batch-1 admission prefill on BUCKET-padded tokens. ``last_idx``:
    the true last spliced position (pad tokens sit after it; causal
    attention keeps them invisible to real positions, and their garbage
    cache rows are rewritten by decode before ever becoming attendable).
    With ``image_tokens`` the request's image words are spliced after BOS
    (the ens5 serving layout, llama_ens5.py:490-512)."""
    from a3vlm_tpu.ops.norms import rms_norm
    from a3vlm_tpu.ops.quant_matmul import qmat

    h = llama.embed_tokens(params, tokens)
    if image_tokens is not None:
        h = jnp.concatenate(
            [h[:, :1], image_tokens.astype(h.dtype), h[:, 1:]], axis=1
        )
    S = h.shape[1]
    h, cache = llama.forward_hidden(
        params, args, h, jnp.arange(S), "causal", cache=cache,
        write_pos=0, attend_cache=False,
    )
    # last_idx [B]: per-row true last position (batched admission packs
    # requests of different true lengths into one bucket-padded prefill)
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]
    h_last = rms_norm(h_last, params["norm"]["weight"], args.norm_eps)
    logits = qmat(h_last, params["output"]["weight"]).astype(jnp.float32)
    return _pick(logits, rng, vocab_limit, temperature, top_p, fsm_row), cache


@functools.partial(
    jax.jit,
    static_argnames=("args", "start", "vocab_limit", "temperature", "top_p"),
    donate_argnames=("cache",),
)
def _extend_jit(params, args, cache, tokens, start, last_idx, rng,
                vocab_limit, temperature, top_p, fsm_row=None):
    """Extend a batch-1 cache that already holds a ``start``-token prefix
    with BUCKET-padded ``tokens`` (no BOS — the prefix owns it): the
    prefix-cache admission path. Same machinery as chunked prefill (write
    at [start, start+Tb), right-aligned causal attention over the
    populated prefix); ``last_idx`` is the true last text index."""
    h = llama.embed_tokens(params, tokens)
    B, T, _ = h.shape
    out, cache = llama.forward_hidden(
        params,
        args,
        h,
        jnp.arange(start, start + T),
        "causal",
        cache=cache,
        write_pos=start,
        kv_valid_len=jnp.full((B,), start + T, jnp.int32),
        attend_cache=True,
        attend_valid_static=start + T,
    )
    from a3vlm_tpu.ops.norms import rms_norm
    from a3vlm_tpu.ops.quant_matmul import qmat

    h_last = jnp.take_along_axis(out, last_idx[:, None, None], axis=1)[:, 0]
    h_last = rms_norm(h_last, params["norm"]["weight"], args.norm_eps)
    logits = qmat(h_last, params["output"]["weight"]).astype(jnp.float32)
    return _pick(logits, rng, vocab_limit, temperature, top_p, fsm_row), cache


@functools.partial(jax.jit, static_argnames=("rows",), donate_argnames=("dst",))
def _copy_prefix(dst, src, rows: int):
    """Copy the first ``rows`` cache rows of a batch-1 prefix cache into a
    (longer) temp cache, broadcasting over the temp's batch dim (batched
    admission shares one prefix across every row)."""

    def put(d, s):
        sl = (slice(None), slice(None), slice(0, rows))
        v = s[sl].astype(d.dtype)
        return d.at[sl].set(jnp.broadcast_to(v, d[sl].shape))

    return jax.tree_util.tree_map(put, dst, src)


class CachedPrefix:
    """A reusable KV prefix (e.g. [BOS | image words] — the shared part of
    every eval query against one object render). ``cache``: batch-1
    layered panels holding rows [0, length); ``tokens``: the prefix's
    TEXT token ids (no image words — used only as drafting context by the
    speculative mode)."""

    def __init__(self, cache, length: int, tokens=None):
        self.cache = cache
        self.length = length
        self.tokens = list(tokens) if tokens is not None else []


@functools.partial(jax.jit, donate_argnames=("cache",))
def _write_slot(cache, temp, slot):
    """Scatter a temp batch-1 cache's panels into pooled-cache slot rows.
    ``slot`` is a TRACED index (one compile per temp shape, not per slot).
    Temp length <= pool length; surplus pool rows keep stale data (never
    attendable before being rewritten)."""
    slot = jnp.asarray(slot, jnp.int32)

    def put(pool, tmp):
        # pool [B, H, S, D] or [B, H, S]; tmp [1, h, s(, d)]
        idx = (slot,) + (0,) * (pool.ndim - 1)
        return jax.lax.dynamic_update_slice(pool, tmp.astype(pool.dtype), idx)

    return jax.tree_util.tree_map(put, cache, temp)


@functools.partial(jax.jit, donate_argnames=("cache",))
def _write_slots(cache, temp, slots):
    """Scatter a batch-B temp cache's panels into B pooled-cache slots
    (``slots`` [B] int32, traced). One dispatch for the whole admission
    group instead of B ``_write_slot`` calls."""

    def put(pool, tmp):
        def body(i, p):
            row = jax.lax.dynamic_slice_in_dim(tmp, i, 1, 0)
            idx = (slots[i],) + (0,) * (p.ndim - 1)
            return jax.lax.dynamic_update_slice(p, row.astype(p.dtype), idx)

        return jax.lax.fori_loop(0, tmp.shape[0], body, pool)

    return jax.tree_util.tree_map(put, cache, temp)


class ContinuousBatcher:
    """Slot-based continuous batching over a pooled KV cache.

    ``params`` must be the decode layout (``llama.unstack_layers``).
    Greedy decoding; per-request max_gen_len and EOS stop."""

    def __init__(
        self,
        params,
        args: ModelArgs,
        tokenizer,
        slots: int = 4,
        max_seq_len: Optional[int] = None,
        kv_cache_bits: Optional[int] = None,
        ens5_params=None,
        ens5_cfg=None,
        vocab_limit: Optional[int] = None,
        seed: int = 0,
        mesh=None,
        draft_k: int = 0,
        fsm=None,
        steps_per_dispatch: int = 1,
    ):
        """``ens5_params``/``ens5_cfg``: pass the full multimodal tree +
        Ens5Config to serve IMAGE-conditioned requests — admission encodes
        the request's image through the tower ensemble and splices the
        image words into its prefill (the A3VLM serving mode).

        ``draft_k`` > 0 turns on PROMPT-LOOKUP SPECULATIVE DECODING inside
        the batcher (greedy only): every ragged step verifies ``draft_k``
        host-drafted tokens per slot in one (K+1)-token forward, emitting
        1..K+1 tokens per slot per round with output exactly equal to
        vanilla greedy. The pool carries draft_k+1 spare rows so the last
        verify window never clamps onto valid cache rows.

        ``fsm``: a ``constrained.TokenFsm`` — every slot's generated
        tokens are masked to the answer grammar (per-slot DFA state,
        reset at admission; EOS legal only at grammar-complete answers).
        Composes with greedy/top-p and with speculative mode (verify
        masks each window position by the state walked along the draft,
        so output stays exactly the constrained-greedy sequence).

        ``steps_per_dispatch`` > 1 (vanilla mode only): each decode round
        runs that many ragged steps inside one jit (``_ragged_step_chunk``)
        and reads back one [B, T] token block — output is exactly the
        per-step path's, but the host<->device round-trip cost (the 0.46x
        on-chip regression vs static waves at T=1 over the relay)
        amortizes T-fold. Admission granularity coarsens to T steps: a
        slot finishing mid-chunk idles for the remainder, so keep T well
        under typical gen lengths (8 vs gen 16-64 costs ~9%% occupancy)."""
        self.params = llama.unstack_layers(params)
        self.args = args
        self.ens5_params = ens5_params
        self.ens5_cfg = ens5_cfg
        self.vocab_limit = vocab_limit
        self._rng = jax.random.PRNGKey(seed)
        self._encode_jit = None
        # multichip serving: pooled cache sharded slots-on-"data" /
        # kv-heads-on-"model" (params are expected pre-sharded, e.g. via
        # parallel.shard_params + quantized_partition_specs)
        self.mesh = mesh
        self.tokenizer = tokenizer
        self.slots = slots
        self.max_seq_len = max_seq_len or args.max_seq_len
        self.kv_bits = kv_cache_bits
        self.draft_k = int(draft_k)
        self.steps_per_dispatch = int(steps_per_dispatch)
        assert self.steps_per_dispatch >= 1
        assert not (self.draft_k and self.steps_per_dispatch > 1), (
            "speculative mode drafts on host per round; steps_per_dispatch "
            "applies to vanilla decode only"
        )
        dtype = kv_cache_dtype(kv_cache_bits)
        # speculative mode writes verify windows up to draft_k rows past a
        # slot's last emitted position — spare rows keep the ragged writes
        # in-bounds (dynamic_update_slice would otherwise clamp the window
        # onto valid rows and corrupt them)
        pool_rows = self.max_seq_len + (
            self.draft_k + 1 if self.draft_k else 0
        )
        self.cache = llama.KVCache.create(
            args, slots, max_seq_len=pool_rows, dtype=dtype,
            layered=True,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding

            specs = llama.decode_cache_specs(
                args, mesh, slots, quant=kv_cache_bits == 8
            )
            self.cache = jax.tree_util.tree_map(
                lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
                self.cache, specs,
            )
        # host-side mirrors are the source of truth for tokens/positions:
        # they upload as TWO arrays per step instead of per-slot device
        # .at[].set dispatches (each a milliseconds round trip on the relay)
        self._host_tok = np.zeros((slots, 1), np.int32)
        self._host_pos = np.zeros((slots,), np.int64)
        self._active = [None] * slots  # request index or None
        # per-slot token history (prompt text + emitted) for prompt-lookup
        # drafting; maintained only in speculative mode
        self._ctx: list[list[int]] = [[] for _ in range(slots)]
        # grammar-constrained decoding: device table for in-jit masking,
        # host table for per-slot state walks (Generator's layout,
        # generation.py _generate_loop fsm_next)
        self._fsm_np = None
        self._fsm_dev = None
        self._fsm_row0 = None
        self._fsm_state = np.zeros((slots,), np.int32)
        if fsm is not None:
            nxt = fsm.next_state
            pad = args.vocab_size - nxt.shape[1]
            assert pad >= 0, (nxt.shape, "fsm table wider than logits")
            if pad:  # lane-padded vocab tail: never legal
                nxt = np.pad(nxt, ((0, 0), (0, pad)), constant_values=-1)
            self._fsm_np = np.ascontiguousarray(nxt, np.int32)
            self._fsm_dev = jnp.asarray(self._fsm_np)
            if mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as PS

                self._fsm_dev = jax.device_put(
                    self._fsm_dev, NamedSharding(mesh, PS(None, None))
                )
            self._fsm_row0 = self._fsm_dev[0]  # admission = DFA state 0
        self.steps = 0  # batched ragged steps taken (for tests/metrics)
        self.last_stats: Optional[dict] = None  # set by each generate()
        # per-request admit/finish timestamps — generate() resets these
        # per call; an OnlineSession installs its own session-scoped dicts
        self._admit_t: dict[int, float] = {}
        self._finish_t: dict[int, float] = {}

    # -- internal ------------------------------------------------------------

    def warmup(self, buckets=(64, 128, 256, 512), groups=(1, 2, 4, 8),
               prefix_len: Optional[int] = None, temperature: float = 0.0,
               top_p: float = 0.95):
        """Pre-compile every jit shape a serving run over ``buckets``-sized
        prompts will touch, so no remote TPU compile (20-120 s per new
        shape over the relay) lands inside the serving loop. Without this,
        cb_bench's first on-chip run spent ~300 of 342 s compiling
        admission shapes mid-run — TTFT p50 was 316 s of compile stall.

        Shapes warmed: one admission forward per (group x bucket) —
        ``_prefill_jit`` (or ``_extend_jit`` + ``_copy_prefix`` when
        ``prefix_len`` is given, fabricating a zero prefix of that length)
        plus the matching ``_write_slot(s)`` scatter — then one
        ``_ragged_step`` (and one ``_ragged_verify_step`` in speculative
        mode). ``temperature``/``top_p`` are STATIC jit args: warm with
        the values the serving calls will use. Pool state is reset after;
        garbage cache rows are never attendable (write-before-attend)."""
        assert all(a is None for a in self._active), "warmup needs an idle pool"
        self._temperature = float(temperature)
        self._top_p = float(top_p)
        steps0 = self.steps
        prefix = None
        if prefix_len is not None:
            total = -(-prefix_len // 8) * 8
            prefix = CachedPrefix(
                llama.KVCache.create(
                    self.args, 1, max_seq_len=total,
                    dtype=kv_cache_dtype(self.kv_bits), layered=True,
                ),
                prefix_len, tokens=[self.tokenizer.bos_id],
            )
        start = prefix_len or 0
        for Tb in buckets:
            if -(-(start + Tb) // 8) * 8 > self.max_seq_len:
                continue  # near-max prompts take the exact-Tb batch-1
                # path whose shape depends on the actual token count
            for g in groups:
                if g > self.slots:
                    continue
                toks = [self.tokenizer.bos_id] + [0] * (Tb - 1)
                text = [0] * Tb  # prefix admission strips BOS upstream
                self._admit_many([
                    (s, s, text if prefix is not None else toks,
                     None, prefix)
                    for s in range(g)
                ])
                self._active = [None] * self.slots
        # one decode round over the pool (compiles _ragged_step / the
        # speculative verify step); garbage rows land at pos 0..K and are
        # rewritten by any real admission before they can be attended
        self._rng, sub = jax.random.split(self._rng)
        if self.draft_k:
            K = self.draft_k
            fsm_states = (
                None if self._fsm_np is None
                else jnp.zeros((self.slots, K + 1), jnp.int32)
            )
            _, self.cache = _ragged_verify_step(
                self.params, self.args, self.cache,
                jnp.zeros((self.slots, K + 1), jnp.int32),
                jnp.zeros((self.slots,), jnp.int32),
                self.vocab_limit, self._fsm_dev, fsm_states,
            )
        elif self.steps_per_dispatch > 1:
            # inactive slots: the chunk idempotently rewrites row 0
            _, self._rng, self.cache = _ragged_step_chunk(
                self.params, self.args, self.cache,
                jnp.zeros((self.slots, 1), jnp.int32),
                jnp.zeros((self.slots,), jnp.int32),
                jnp.zeros((self.slots,), bool),
                jnp.zeros((self.slots,), jnp.int32),
                jnp.asarray([self.tokenizer.eos_id], jnp.int32),
                self._rng, self.vocab_limit, self._temperature,
                self._top_p, self.steps_per_dispatch,
                int(self.max_seq_len), self._fsm_dev,
                None if self._fsm_dev is None
                else jnp.asarray(self._fsm_state),
            )
        else:
            _, self.cache = _ragged_step(
                self.params, self.args, self.cache,
                jnp.zeros((self.slots, 1), jnp.int32),
                jnp.zeros((self.slots,), jnp.int32),
                sub, self.vocab_limit, self._temperature, self._top_p,
                self._fsm_dev,
                None if self._fsm_dev is None
                else jnp.asarray(self._fsm_state),
            )
        self._host_tok[:] = 0
        self._host_pos[:] = 0
        self._fsm_state[:] = 0
        self._ctx = [[] for _ in range(self.slots)]
        self.steps = steps0

    def make_prefix(self, image=None, tokens=None) -> CachedPrefix:
        """Precompute a reusable KV prefix: ``[BOS | image words]`` (when
        ``image`` is given) optionally followed by ``tokens`` (a shared
        system prompt). The eval workload asks ~12 task-stream questions
        per object render (vqa_task_construction.py) — sharing the
        1456-token image prefix turns each follow-up admission into a
        text-only extension."""
        dtype = kv_cache_dtype(self.kv_bits)
        toks = [self.tokenizer.bos_id] + list(tokens or [])
        image_tokens = None
        length = len(toks)
        if image is not None:
            image_tokens = self._encode_image(image)
            length += self.ens5_cfg.image_words
        total = -(-length // 8) * 8
        cache1 = llama.KVCache.create(
            self.args, 1, max_seq_len=total, dtype=dtype, layered=True
        )
        self._rng, sub = jax.random.split(self._rng)
        _, cache1 = _prefill_jit(
            self.params, self.args, cache1,
            jnp.asarray([toks], jnp.int32), image_tokens,
            jnp.asarray([length - 1], jnp.int32), sub,
            self.vocab_limit, 0.0, 1.0,
        )
        return CachedPrefix(cache1, length, tokens=toks)

    def _encode_image(self, image):
        assert self.ens5_params is not None and self.ens5_cfg is not None
        if self._encode_jit is None:
            from a3vlm_tpu.models import ens5

            self._encode_jit = jax.jit(
                lambda p, im: ens5.build_image_tokens(p, self.ens5_cfg, im)
            )
        return self._encode_jit(self.ens5_params, jnp.asarray(image)[None])

    def _admit_with_prefix(self, slot, req_idx, toks, prefix: CachedPrefix):
        """Prefix-cache admission: copy the shared rows, extend with the
        request's text only (no image encode, no full prefill)."""
        dtype = kv_cache_dtype(self.kv_bits)
        text = toks[1:] if toks and toks[0] == self.tokenizer.bos_id else toks
        spliced = prefix.length + len(text)
        Tb = _bucket(len(text))
        if -(-(prefix.length + Tb) // 8) * 8 > self.max_seq_len:
            # near-max prompts: EXACT token count (no /8 rounding of Tb —
            # only the cache length rounds). generate()'s length assert
            # guarantees prefix.length + len(text) < max_seq_len, so the
            # rounded cache always fits the pool rows.
            Tb = len(text)
        padded = list(text) + [0] * (Tb - len(text))
        total = -(-(prefix.length + Tb) // 8) * 8
        temp = llama.KVCache.create(
            self.args, 1, max_seq_len=total, dtype=dtype, layered=True
        )
        temp = _copy_prefix(temp, prefix.cache, prefix.length)
        self._rng, sub = jax.random.split(self._rng)
        first_arr, temp = _extend_jit(
            self.params, self.args, temp,
            jnp.asarray([padded], jnp.int32), prefix.length,
            jnp.asarray([len(text) - 1], jnp.int32), sub,
            self.vocab_limit, self._temperature, self._top_p,
            self._fsm_row0,
        )
        first = int(first_arr[0])
        self.cache = _write_slot(self.cache, temp, slot)
        self._host_tok[slot, 0] = first
        self._host_pos[slot] = spliced
        self._active[slot] = req_idx
        self._ctx[slot] = list(prefix.tokens) + list(text) + [first]
        if self._fsm_np is not None:
            self._fsm_state[slot] = max(int(self._fsm_np[0, first]), 0)
        return first

    def _admit(self, slot: int, req_idx: int, toks: list[int], image=None,
               prefix: Optional[CachedPrefix] = None):
        if prefix is not None:
            return self._admit_with_prefix(slot, req_idx, toks, prefix)
        dtype = kv_cache_dtype(self.kv_bits)
        image_tokens = None
        spliced = len(toks)
        W = 0
        if image is not None:
            image_tokens = self._encode_image(image)
            W = self.ens5_cfg.image_words
            spliced += W
        Tb = _bucket(len(toks))
        if -(-(W + Tb) // 8) * 8 > self.max_seq_len:
            Tb = len(toks)  # near-max prompts: exact token count
        padded = list(toks) + [0] * (Tb - len(toks))
        total = -(-(W + Tb) // 8) * 8  # KVCache.create rounds to /8

        cache1 = llama.KVCache.create(
            self.args, 1, max_seq_len=total, dtype=dtype, layered=True
        )
        tokens = jnp.asarray([padded], jnp.int32)
        self._rng, sub = jax.random.split(self._rng)
        first_arr, cache1 = _prefill_jit(
            self.params, self.args, cache1, tokens, image_tokens,
            jnp.asarray([spliced - 1], jnp.int32), sub,
            self.vocab_limit, self._temperature, self._top_p,
            self._fsm_row0,
        )
        first = int(first_arr[0])
        self.cache = _write_slot(self.cache, cache1, slot)
        self._host_tok[slot, 0] = first
        self._host_pos[slot] = spliced
        self._active[slot] = req_idx
        self._ctx[slot] = list(toks) + [first]
        if self._fsm_np is not None:
            self._fsm_state[slot] = max(int(self._fsm_np[0, first]), 0)
        return first

    def _admit_group(self, items, Tb: int, prefix: Optional[CachedPrefix]):
        """Batched admission: B same-bucket requests prefilled in ONE
        forward (items: [(slot, req_idx, text_tokens)]). Sequential
        batch-1 admissions each stream the full weight set; when several
        slots free at once (start of an eval group: ~12 questions sharing
        one image prefix admit together) batching divides that weight
        traffic by B. Admission-group sizes are split to powers of two
        upstream so compile shapes stay bounded."""
        dtype = kv_cache_dtype(self.kv_bits)
        B = len(items)
        start = prefix.length if prefix is not None else 0
        total = -(-(start + Tb) // 8) * 8
        temp = llama.KVCache.create(
            self.args, B, max_seq_len=total, dtype=dtype, layered=True
        )
        padded = [list(t) + [0] * (Tb - len(t)) for _, _, t in items]
        last = [len(t) - 1 for _, _, t in items]
        self._rng, sub = jax.random.split(self._rng)
        if prefix is not None:
            temp = _copy_prefix(temp, prefix.cache, prefix.length)
            firsts, temp = _extend_jit(
                self.params, self.args, temp,
                jnp.asarray(padded, jnp.int32), start,
                jnp.asarray(last, jnp.int32), sub,
                self.vocab_limit, self._temperature, self._top_p,
                self._fsm_row0,
            )
        else:
            firsts, temp = _prefill_jit(
                self.params, self.args, temp,
                jnp.asarray(padded, jnp.int32), None,
                jnp.asarray(last, jnp.int32), sub,
                self.vocab_limit, self._temperature, self._top_p,
                self._fsm_row0,
            )
        self.cache = _write_slots(
            self.cache, temp,
            jnp.asarray([s for s, _, _ in items], jnp.int32),
        )
        firsts = np.asarray(firsts)
        out = {}
        for b, (slot, req_idx, text) in enumerate(items):
            first = int(firsts[b])
            self._host_tok[slot, 0] = first
            self._host_pos[slot] = start + len(text)
            self._active[slot] = req_idx
            pre = list(prefix.tokens) if prefix is not None else []
            self._ctx[slot] = pre + list(text) + [first]
            if self._fsm_np is not None:
                self._fsm_state[slot] = max(int(self._fsm_np[0, first]), 0)
            out[req_idx] = first
        return out

    def _admit_many(self, items) -> dict:
        """Admit a set of requests, batching where profitable. ``items``:
        [(slot, req_idx, toks, image, prefix)]. Groupable: same bucket
        AND same prefix object (or both prefix-free), text-only (image
        admissions encode through the towers — left batch-1). Returns
        {req_idx: first_token}."""
        bos = self.tokenizer.bos_id
        groups: dict = {}
        singles = []
        firsts: dict = {}
        for it in items:
            slot, req_idx, toks, image, prefix = it
            if image is not None:
                singles.append(it)
                continue
            if prefix is not None:
                text = toks[1:] if toks and toks[0] == bos else toks
                Tb = _bucket(len(text))
                if -(-(prefix.length + Tb) // 8) * 8 > self.max_seq_len:
                    singles.append(it)  # near-max: exact-Tb batch-1 path
                    continue
                groups.setdefault((id(prefix), Tb), []).append(
                    (slot, req_idx, text, prefix)
                )
            else:
                Tb = _bucket(len(toks))
                if -(-Tb // 8) * 8 > self.max_seq_len:
                    singles.append(it)
                    continue
                groups.setdefault((None, Tb), []).append(
                    (slot, req_idx, toks, None)
                )
        for (_, Tb), g in groups.items():
            while g:
                take = next((c for c in (8, 4, 2) if len(g) >= c), 1)
                chunk, g = g[:take], g[take:]
                if take == 1:
                    slot, req_idx, text, prefix = chunk[0]
                    singles.append(
                        (slot, req_idx, text, None, prefix)
                        if prefix is not None
                        else (slot, req_idx, text, None, None)
                    )
                    continue
                prefix = chunk[0][3]
                firsts.update(self._admit_group(
                    [(s, r, t) for s, r, t, _ in chunk], Tb, prefix
                ))
        for slot, req_idx, toks, image, prefix in singles:
            firsts[req_idx] = self._admit(
                slot, req_idx, toks, image=image, prefix=prefix
            )
        return firsts

    def _speculative_round(self, out_tokens, gen_lims, stops,
                           additional_stop_symbols):
        """One prompt-lookup verify round over all slots (greedy): draft
        ``draft_k`` tokens per active slot from its token history, verify
        the whole batch in one (K+1)-token ragged forward, and emit each
        slot's accepted prefix + one bonus token — per-token bookkeeping
        (stop tokens/symbols, gen limits, length caps) identical to the
        vanilla one-token loop, so output is exactly vanilla greedy."""
        tok = self.tokenizer
        K = self.draft_k
        drafts = np.zeros((self.slots, K), np.int32)
        for slot in range(self.slots):
            if self._active[slot] is not None:
                drafts[slot] = _lookup_draft(self._ctx[slot], K)
        window = np.concatenate(
            [self._host_tok, drafts], axis=1
        )  # [B, K+1]
        fsm_states = None
        if self._fsm_np is not None:
            # state for masking window position j = the DFA walked along
            # drafts[0..j-1]; a dead walk clamps to 0, which is safe —
            # the mismatch at the illegal draft stops acceptance before
            # any clamped position can be emitted
            fsm_states = np.zeros((self.slots, K + 1), np.int32)
            for slot in range(self.slots):
                if self._active[slot] is None:
                    continue
                st = int(self._fsm_state[slot])
                fsm_states[slot, 0] = st
                for j in range(1, K + 1):
                    if st >= 0:
                        st = int(self._fsm_np[st, window[slot, j]])
                    fsm_states[slot, j] = max(st, 0)
        preds, self.cache = _ragged_verify_step(
            self.params, self.args, self.cache,
            jnp.asarray(window, jnp.int32),
            jnp.asarray(self._host_pos.astype(np.int32)),
            self.vocab_limit,
            self._fsm_dev,
            None if fsm_states is None else jnp.asarray(fsm_states),
        )
        self.steps += 1
        preds = np.asarray(preds)
        for slot in range(self.slots):
            idx = self._active[slot]
            if idx is None:
                continue  # idle slot: rewrites its own stale rows (all
                # within the pool's spare region — never attendable)
            m = 0  # accepted drafts: longest verified prefix
            while m < K and preds[slot, m] == window[slot, m + 1]:
                m += 1
            done = False
            emitted = 0
            for j in range(m + 1):  # accepted drafts + the bonus token
                t = int(preds[slot, j])
                out_tokens[idx].append(t)
                self._ctx[slot].append(t)
                self._host_pos[slot] += 1
                emitted += 1
                if self._fsm_np is not None:
                    self._fsm_state[slot] = max(
                        int(self._fsm_np[self._fsm_state[slot], t]), 0
                    )
                done = (
                    t in stops
                    or len(out_tokens[idx]) >= gen_lims[idx]
                    or self._host_pos[slot] + 1 >= self.max_seq_len
                )
                if not done and additional_stop_symbols:
                    tail = tok.decode(out_tokens[idx][-8:])
                    done = any(
                        sym in tail for sym in additional_stop_symbols
                    )
                if done:
                    break
            if done:
                self._active[slot] = None
                self._finish_t[idx] = time.perf_counter()
            else:
                self._host_tok[slot, 0] = int(preds[slot, emitted - 1])

    def _decode_round_chunked(self, out_tokens, gen_lims, stops,
                              additional_stop_symbols):
        """steps_per_dispatch ragged steps in one jit + one readback
        (see _ragged_step_chunk). The host walk below mirrors the in-jit
        stop logic exactly, so a slot's emitted tokens are identical to
        the per-step path's; finish timestamps land at chunk granularity."""
        tok = self.tokenizer
        T = self.steps_per_dispatch
        active = np.array([a is not None for a in self._active], bool)
        remaining = np.zeros((self.slots,), np.int32)
        for slot, idx in enumerate(self._active):
            if idx is not None:
                remaining[slot] = gen_lims[idx] - len(out_tokens[idx])
        toks, self._rng, self.cache = _ragged_step_chunk(
            self.params, self.args, self.cache,
            jnp.asarray(self._host_tok),
            jnp.asarray(self._host_pos.astype(np.int32)),
            jnp.asarray(active), jnp.asarray(remaining),
            jnp.asarray(sorted(stops), jnp.int32), self._rng,
            self.vocab_limit, self._temperature, self._top_p,
            T, int(self.max_seq_len),
            self._fsm_dev,
            None if self._fsm_dev is None
            else jnp.asarray(self._fsm_state),
        )
        self.steps += T
        toks_host = np.asarray(toks)
        now = time.perf_counter()
        for slot in range(self.slots):
            idx = self._active[slot]
            if idx is None:
                continue
            done = False
            for j in range(T):
                t = int(toks_host[slot, j])
                out_tokens[idx].append(t)
                self._host_pos[slot] += 1
                self._host_tok[slot, 0] = t
                if self._fsm_np is not None:
                    self._fsm_state[slot] = max(
                        int(self._fsm_np[self._fsm_state[slot], t]), 0
                    )
                done = (
                    t in stops
                    or len(out_tokens[idx]) >= gen_lims[idx]
                    or self._host_pos[slot] + 1 >= self.max_seq_len
                )
                if not done and additional_stop_symbols:
                    tail = tok.decode(out_tokens[idx][-8:])
                    done = any(
                        sym in tail for sym in additional_stop_symbols
                    )
                if done:
                    break
            if done:
                self._active[slot] = None
                self._finish_t[idx] = now

    def _decode_round(self, out_tokens, gen_lims, stops,
                      additional_stop_symbols):
        """One vanilla batched ragged step over all slots + per-slot
        bookkeeping (stop tokens/symbols, gen limits, length caps)."""
        tok = self.tokenizer
        self._rng, sub = jax.random.split(self._rng)
        nxt, self.cache = _ragged_step(
            self.params, self.args, self.cache,
            jnp.asarray(self._host_tok),
            jnp.asarray(self._host_pos.astype(np.int32)),
            sub, self.vocab_limit, self._temperature, self._top_p,
            self._fsm_dev,
            None if self._fsm_dev is None
            else jnp.asarray(self._fsm_state),
        )
        self.steps += 1
        nxt_host = np.asarray(nxt)
        for slot in range(self.slots):
            idx = self._active[slot]
            if idx is None:
                continue  # idle slot: token/pos unchanged (rewrites
                # its own last row harmlessly)
            t = int(nxt_host[slot])
            out_tokens[idx].append(t)
            self._host_pos[slot] += 1
            self._host_tok[slot, 0] = t
            if self._fsm_np is not None:
                self._fsm_state[slot] = max(
                    int(self._fsm_np[self._fsm_state[slot], t]), 0
                )
            done = (
                t in stops
                or len(out_tokens[idx]) >= gen_lims[idx]
                or self._host_pos[slot] + 1 >= self.max_seq_len
            )
            if not done and additional_stop_symbols:
                # multi-token stop strings (the '###' conversation
                # separator): host-side suffix check on the decoded
                # tail, like Generator's in-loop stop matching
                tail = tok.decode(out_tokens[idx][-8:])
                done = any(
                    sym in tail for sym in additional_stop_symbols
                )
            if done:
                self._active[slot] = None
                self._finish_t[idx] = time.perf_counter()

    def _build_stats(self, t0: float, out_tokens: dict) -> dict:
        """Per-request latency metrics for the finished generate() call
        (stored as ``self.last_stats``): TTFT (queue wait + prefill — the
        first token lands at admission), TPOT (decode seconds per token
        after the first), and pool-level throughput. The production
        serving numbers the reference never reports (its eval loop is
        wall-clock-only, eval_affordance_v2.py:330-384)."""
        per = []
        for i, toks in out_tokens.items():
            if i not in self._admit_t:
                continue  # never admitted (caller aborted early)
            ttft = self._admit_t[i] - t0
            fin = self._finish_t.get(i, self._admit_t[i])
            dec = max(fin - self._admit_t[i], 0.0)
            n = len(toks)
            per.append({
                "tokens": n,
                "ttft_s": ttft,
                "tpot_ms": 1e3 * dec / (n - 1) if n > 1 else 0.0,
            })
        if not per:
            return {"requests": 0}

        def pct(vals, q):
            v = sorted(vals)
            return v[min(int(q * (len(v) - 1) + 0.5), len(v) - 1)]

        ttfts = [p["ttft_s"] for p in per]
        tpots = [p["tpot_ms"] for p in per if p["tokens"] > 1]
        total = max(self._finish_t.values()) - t0
        ntok = sum(p["tokens"] for p in per)
        return {
            "requests": len(per),
            "total_s": total,
            "tokens": ntok,
            "tokens_per_sec": ntok / total if total > 0 else 0.0,
            "ttft_p50_s": pct(ttfts, 0.5),
            "ttft_p95_s": pct(ttfts, 0.95),
            "tpot_p50_ms": pct(tpots, 0.5) if tpots else 0.0,
            "tpot_p95_ms": pct(tpots, 0.95) if tpots else 0.0,
            "per_request": per,
        }

    # -- API -----------------------------------------------------------------

    def online(self, temperature: float = 0.0, top_p: float = 0.95,
               additional_stop_tokens: Sequence[int] = (),
               additional_stop_symbols: Sequence[str] = ()):
        """Open an arrival-time serving session over this pool: requests
        ``submit()`` at any time and are admitted as slots free up; each
        ``step()`` advances every active slot one round. The true online
        counterpart of ``generate()``'s offline-batch mode (sampling
        config is pooled — one jitted step serves every slot — so it is
        fixed per session, not per request). Do not interleave ``generate``
        calls with an open session (both own the slot pool)."""
        return OnlineSession(
            self, temperature=temperature, top_p=top_p,
            additional_stop_tokens=additional_stop_tokens,
            additional_stop_symbols=additional_stop_symbols,
        )

    def generate(
        self,
        prompts: Sequence[str],
        max_gen_len: int | Sequence[int] = 64,
        additional_stop_tokens: Sequence[int] = (),
        additional_stop_symbols: Sequence[str] = (),
        images: Optional[Sequence] = None,
        temperature: float = 0.0,
        top_p: float = 0.95,
        prefixes: Optional[Sequence] = None,
    ) -> list[str]:
        """Run all prompts to completion through the slot pool; requests
        are admitted as slots free up (arrival order), so short requests
        don't hold back long ones. ``max_gen_len`` may be per-request (a
        ragged-workload knob). Returns decoded generations in input
        order."""
        tok = self.tokenizer
        self._temperature = float(temperature)
        self._top_p = float(top_p)
        assert not (self.draft_k and self._temperature != 0.0), (
            "speculative continuous batching (draft_k > 0) is greedy-only"
        )
        reqs = [tok.encode(p, bos=True, eos=False) for p in prompts]
        gen_lims = (
            list(max_gen_len)
            if not isinstance(max_gen_len, int)
            else [max_gen_len] * len(reqs)
        )
        assert len(gen_lims) == len(reqs)
        W = (
            self.ens5_cfg.image_words
            if images is not None and self.ens5_cfg is not None else 0
        )
        for i, (r, g) in enumerate(zip(reqs, gen_lims)):
            n = len(r)
            if prefixes is not None and prefixes[i] is not None:
                w = prefixes[i].length
                # prefix admission splices the BOS-stripped text after the
                # prefix (the prefix already starts with BOS) — don't
                # double-count BOS in the capacity check
                if r and r[0] == tok.bos_id:
                    n -= 1
            else:
                w = W if images is not None and images[i] is not None else 0
            assert n + w + g <= self.max_seq_len, (
                n, w, g, self.max_seq_len,
            )
        queue = deque(range(len(reqs)))
        out_tokens: dict[int, list[int]] = {i: [] for i in range(len(reqs))}
        stops = {tok.eos_id, *additional_stop_tokens}
        # per-request serving metrics (offline-batch semantics: every
        # request "arrives" at t0, so TTFT includes its queue wait)
        t0 = time.perf_counter()
        self._admit_t: dict[int, float] = {}
        self._finish_t: dict[int, float] = {}

        while queue or any(a is not None for a in self._active):
            # admission between steps (batched where buckets/prefixes align)
            pairs = []
            for slot in range(self.slots):
                if self._active[slot] is None and queue:
                    idx = queue.popleft()
                    pairs.append((
                        slot, idx, reqs[idx],
                        None if images is None else images[idx],
                        None if prefixes is None else prefixes[idx],
                    ))
            if pairs:
                firsts = self._admit_many(pairs)
                now = time.perf_counter()
                for slot, idx, *_ in pairs:
                    first = firsts[idx]
                    self._admit_t[idx] = now
                    out_tokens[idx].append(first)
                    if first in stops or gen_lims[idx] <= 1:
                        self._active[slot] = None
                        self._finish_t[idx] = now
            if not any(a is not None for a in self._active):
                continue

            if self.draft_k:
                self._speculative_round(
                    out_tokens, gen_lims, stops, additional_stop_symbols
                )
            elif self.steps_per_dispatch > 1:
                self._decode_round_chunked(
                    out_tokens, gen_lims, stops, additional_stop_symbols
                )
            else:
                self._decode_round(
                    out_tokens, gen_lims, stops, additional_stop_symbols
                )

        self.last_stats = self._build_stats(t0, out_tokens)
        results = []
        for i in range(len(reqs)):
            toks = out_tokens[i]
            for s in stops:
                if s in toks:
                    toks = toks[: toks.index(s)]
            text = tok.decode(toks)
            for sym in additional_stop_symbols:
                if sym in text:
                    text = text.split(sym)[0]
            results.append(text)
        return results

class OnlineSession:
    """Arrival-time continuous batching (the production serving loop the
    reference lacks — its server decodes lockstep batches only,
    multi_gpu_wrapper.py:260-320): ``submit()`` enqueues a request at any
    time and returns a request id; ``step()`` admits queued requests into
    free slots then advances every active slot one round (one token — or
    one speculative verify window when the pool has ``draft_k``);
    ``poll()`` reads a request's output so far; ``drain()`` steps until
    idle. Output per request is exactly what ``generate()`` produces for
    the same prompt; TTFT in ``stats()`` is measured from SUBMIT time
    (true arrival), not batch start."""

    def __init__(self, cb: ContinuousBatcher, temperature: float = 0.0,
                 top_p: float = 0.95,
                 additional_stop_tokens: Sequence[int] = (),
                 additional_stop_symbols: Sequence[str] = ()):
        assert not (cb.draft_k and temperature != 0.0), (
            "speculative continuous batching (draft_k > 0) is greedy-only"
        )
        self.cb = cb
        cb._temperature = float(temperature)
        cb._top_p = float(top_p)
        # session-scoped timestamp sinks (the round methods write into
        # these via the batcher)
        cb._admit_t = {}
        cb._finish_t = {}
        self.stops = {cb.tokenizer.eos_id, *additional_stop_tokens}
        self.stop_syms = tuple(additional_stop_symbols)
        self.queue: deque[int] = deque()
        self.out_tokens: dict[int, list[int]] = {}
        self.gen_lims: dict[int, int] = {}
        self._toks: dict[int, list[int]] = {}
        self._images: dict = {}
        self._prefixes: dict = {}
        self._arrival: dict[int, float] = {}
        self._next_id = 0

    def submit(self, prompt: str, max_gen_len: int = 64, image=None,
               prefix: Optional[CachedPrefix] = None) -> int:
        """Enqueue one request; returns its id (admitted at a later
        ``step()`` when a slot frees). Capacity-checked like generate()."""
        cb = self.cb
        toks = cb.tokenizer.encode(prompt, bos=True, eos=False)
        n = len(toks)
        if prefix is not None:
            w = prefix.length
            if toks and toks[0] == cb.tokenizer.bos_id:
                n -= 1  # prefix owns BOS; admission splices text only
        else:
            w = (
                cb.ens5_cfg.image_words
                if image is not None and cb.ens5_cfg is not None else 0
            )
        assert n + w + max_gen_len <= cb.max_seq_len, (
            n, w, max_gen_len, cb.max_seq_len,
        )
        rid = self._next_id
        self._next_id += 1
        self._toks[rid] = toks
        self._images[rid] = image
        self._prefixes[rid] = prefix
        self.gen_lims[rid] = int(max_gen_len)
        self.out_tokens[rid] = []
        self._arrival[rid] = time.perf_counter()
        self.queue.append(rid)
        return rid

    def step(self) -> int:
        """Admit what fits, advance one round; returns outstanding work
        (active slots + queued requests) — 0 means idle."""
        cb = self.cb
        pairs = []
        for slot in range(cb.slots):
            if cb._active[slot] is None and self.queue:
                rid = self.queue.popleft()
                pairs.append((
                    slot, rid, self._toks[rid],
                    self._images.pop(rid, None),
                    self._prefixes.pop(rid, None),
                ))
        if pairs:
            firsts = cb._admit_many(pairs)
            now = time.perf_counter()
            for slot, rid, *_ in pairs:
                first = firsts[rid]
                cb._admit_t[rid] = now
                self.out_tokens[rid].append(first)
                if first in self.stops or self.gen_lims[rid] <= 1:
                    cb._active[slot] = None
                    cb._finish_t[rid] = now
        if any(a is not None for a in cb._active):
            if cb.draft_k:
                cb._speculative_round(
                    self.out_tokens, self.gen_lims, self.stops,
                    self.stop_syms,
                )
            else:
                cb._decode_round(
                    self.out_tokens, self.gen_lims, self.stops,
                    self.stop_syms,
                )
        return (
            sum(a is not None for a in cb._active) + len(self.queue)
        )

    def poll(self, rid: int) -> dict:
        """Snapshot one request: ``done``, raw ``tokens`` so far, and
        ``text`` with stop tokens/symbols stripped (generate()'s exact
        postprocessing, applied incrementally)."""
        toks = list(self.out_tokens.get(rid, ()))
        for s in self.stops:
            if s in toks:
                toks = toks[: toks.index(s)]
        text = self.cb.tokenizer.decode(toks)
        for sym in self.stop_syms:
            if sym in text:
                text = text.split(sym)[0]
        return {
            "done": rid in self.cb._finish_t,
            "tokens": list(self.out_tokens.get(rid, ())),
            "text": text,
        }

    def drain(self) -> None:
        while self.step():
            pass

    def stats(self) -> dict:
        """Per-request serving metrics over everything finished so far:
        TTFT from SUBMIT (arrival) time, TPOT, throughput percentiles —
        same schema as ContinuousBatcher.last_stats."""
        cb = self.cb
        per = []
        for rid, fin in cb._finish_t.items():
            adm = cb._admit_t[rid]
            n = len(self.out_tokens[rid])
            per.append({
                "tokens": n,
                "ttft_s": adm - self._arrival[rid],
                "tpot_ms": 1e3 * max(fin - adm, 0.0) / (n - 1)
                if n > 1 else 0.0,
            })
        if not per:
            return {"requests": 0}

        def pct(vals, q):
            v = sorted(vals)
            return v[min(int(q * (len(v) - 1) + 0.5), len(v) - 1)]

        t0 = min(self._arrival.values())
        total = max(cb._finish_t.values()) - t0
        ttfts = [p["ttft_s"] for p in per]
        tpots = [p["tpot_ms"] for p in per if p["tokens"] > 1]
        ntok = sum(p["tokens"] for p in per)
        return {
            "requests": len(per),
            "total_s": total,
            "tokens": ntok,
            "tokens_per_sec": ntok / total if total > 0 else 0.0,
            "ttft_p50_s": pct(ttfts, 0.5),
            "ttft_p95_s": pct(ttfts, 0.95),
            "tpot_p50_ms": pct(tpots, 0.5) if tpots else 0.0,
            "tpot_p95_ms": pct(tpots, 0.95) if tpots else 0.0,
            "per_request": per,
        }
