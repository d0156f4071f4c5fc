"""Prompt-lookup speculative decoding (batch-1, greedy, whole-loop jit).

A draft-model-free speculative decoder for the image->triad latency path:
triad answers are highly structured (repeated ``<rb>``/``<axis>`` tags,
fixed-format number lists, phrases copied from the instruction), so the
NEXT tokens frequently already appear after an earlier occurrence of the
current bigram. Each iteration:

1. finds the most recent earlier occurrence of the longest suffix n-gram
   (n up to 4) in [prompt + generated so far] (vectorized match, in-jit),
2. takes the K-1 tokens that followed it as a DRAFT,
3. runs ONE K-token verify forward through the decode cache (batch-1
   decode is weight-bandwidth bound — a K-token step streams the same
   weight bytes as a 1-token step, so verification is nearly free),
4. accepts the longest matching prefix and emits ``accepted + 1`` tokens
   (the standard speculative guarantee: output is EXACTLY the greedy
   sequence).

Cache discipline: the verify step writes all K rows at [pos, pos+K);
rejected rows hold garbage but the next window [pos+m, pos+m+K) rewrites
them before they can ever be attended (same write-before-attend invariant
as the continuous batcher's bucket padding). No reference analogue — the
torch stack decodes one token per step (llama_ens5.py:513-531).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from a3vlm_tpu.models import llama
from a3vlm_tpu.ops.norms import rms_norm
from a3vlm_tpu.ops.quant_matmul import qmat


def _verify_step(params, args, cache, tokens_k, pos):
    """Run K draft tokens through the decode cache at absolute positions
    [pos, pos+K); returns (greedy preds [K], cache). Multi-token cache
    attention goes through the right-aligned-causal XLA path (the fused
    decode kernel is Sq==1-only)."""
    K = tokens_k.shape[-1]
    h = llama.embed_tokens(params, tokens_k[None])  # [1, K, D]
    positions = pos + jnp.arange(K)
    h, cache = llama.forward_hidden(
        params,
        args,
        h,
        positions[None],  # [1, K]: per-batch position rows (ragged form)
        "causal",
        cache=cache,
        write_pos=jnp.full((1,), pos, jnp.int32),
        kv_valid_len=jnp.full((1,), pos + K, jnp.int32),
    )
    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    logits = qmat(h[0], params["output"]["weight"]).astype(jnp.float32)
    return logits, cache


@functools.partial(
    jax.jit,
    static_argnames=("args", "gen_len", "draft_k", "vocab_limit",
                     "stop_token", "temperature", "top_p", "accept_cap",
                     "max_n"),
    donate_argnames=("cache",),
)
def lookup_generate(
    params,
    args,
    cache,
    prompt_ids,  # [P] int32 (text ids only; cache already prefilled)
    start_pos,  # scalar: absolute position of the NEXT token (P + W)
    first_token,  # scalar: greedy token after prefill
    gen_len: int,
    draft_k: int = 8,
    vocab_limit=None,
    stop_token: int = -1,
    fsm_next=None,  # [S, V] int32 grammar table (constrained.TokenFsm)
    fsm_state0=None,  # scalar: DFA state AFTER first_token
    temperature: float = 0.0,
    top_p: float = 0.95,
    sample_keys=None,  # [gen_len + draft_k, 2] uint32: vanilla split chain
    accept_cap: tuple | None = None,  # BENCH-ONLY acceptance replay (below)
    max_n: int = 4,  # longest suffix n-gram length tried by find_draft
):
    """Greedy speculative generation; returns (tokens [gen_len], count).

    ``tokens[:count]`` equals exactly what one-token-at-a-time greedy
    decoding would produce (stopping at ``stop_token`` if emitted).

    SAMPLING (``temperature > 0``): verify position ``i`` of a window that
    starts with ``n_emit`` tokens already emitted is sampled with
    ``sample_keys[n_emit + i]`` — the caller passes the vanilla loop's
    per-step rng split chain, so the output is BIT-IDENTICAL to the
    one-token-at-a-time sampling loop with the same seed, not merely
    equal in distribution: each position's logits condition on the draft
    prefix, which equals the emitted prefix wherever the token counts as
    accepted, and the key for emitted index t is sub_t either way.
    Acceptance compares the SAMPLED token to the draft, so acceptance
    rates drop as temperature rises (the draft is deterministic), but
    exactness never does.

    With ``fsm_next`` set, the guarantee is against grammar-CONSTRAINED
    greedy decoding (generation._generate_loop's fsm semantics): each
    verify position's logits are masked by the DFA state walked along the
    draft prefix, and draft tokens that would kill the DFA are repaired to
    a legal token before verification (repair only changes PROPOSALS, so
    exactness is unaffected; it keeps later window positions meaningful —
    an illegal draft token would make every subsequent position's state,
    and thus its mask, garbage). Grammar structure raises acceptance:
    format tokens (tags, brackets, separators) are often the only legal
    continuation, so repaired drafts match the constrained argmax even
    where the n-gram lookup misses.

    CACHE SIZING: the final verify window can write up to ``draft_k``
    rows past the last emitted position — size the cache with
    ``start_pos + gen_len + draft_k + 1`` rows (dynamic_update_slice
    would otherwise clamp the window onto the last rows and corrupt
    them).

    ``accept_cap`` (BENCH-ONLY): a tuple of per-round caps on the
    accepted draft length, cycled by round index. Accepting FEWER
    tokens than matched is always legal (each emitted token was still
    verified), so exactness is unaffected — the knob only forces the
    loop to spend the round count a given realized acceptance would.
    bench.py uses it to measure the full-scale latency of the lookup
    loop at the acceptance measured on real triad content by
    scripts/spec_acceptance.py (fabricated bench weights emit constant
    tokens, whose near-perfect acceptance is otherwise an upper bound).
    Production callers leave it None."""
    P = prompt_ids.shape[0]
    K = draft_k
    BUF = P + gen_len + K + 2
    buf = jnp.zeros((BUF,), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, prompt_ids, (0,))
    buf = buf.at[P].set(first_token)
    use_fsm = fsm_next is not None

    def mask_logits(lg, states=None):
        # -1e30 (not -inf) to match _generate_loop's mask bit-for-bit:
        # the sampling path's softmax input must be identical
        if vocab_limit is not None and vocab_limit < lg.shape[-1]:
            lg = lg.at[..., vocab_limit:].set(-1e30)
        if use_fsm:
            # states[i] = DFA state before predicting position i's token
            lg = jnp.where(fsm_next[states] >= 0, lg, -1e30)
        return lg

    def find_draft(buf, n_buf, last_tok, max_n: int = max_n):
        """Longest-suffix n-gram lookup (n = max_n .. 1): the most recent
        i with buf[i : i+n] == buf[n_buf-n : n_buf] and i+n < n_buf;
        draft = buf[i+n : i+n+K-1]. Longer matched context disambiguates
        repeats (a bigram like ", 0" recurs all over a triad string; the
        4-gram pins the right continuation), raising accepted-prefix
        lengths at ~4 extra vector compares per round. Suffix-length
        matches accumulate incrementally: hit_n[i] = (buf[i] ==
        buf[n_buf-n]) & hit_{n-1}[i+1]."""
        idx = jnp.arange(BUF)
        prev = jnp.ones((BUF,), bool)
        cont_start = jnp.int32(-1)  # continuation start for the BEST n
        for m in range(1, max_n + 1):
            cmp = buf == buf[jnp.maximum(n_buf - m, 0)]
            prev = cmp & (jnp.roll(prev, -1) if m > 1 else True)
            # i+m < n_buf: continuation strictly earlier than the
            # suffix's own occurrence (also kills n_buf <= m outright)
            hit = prev & (idx + m < n_buf)
            best = jnp.max(jnp.where(hit, idx, -1))
            cont_start = jnp.where(best >= 0, best + m, cont_start)
        found = cont_start >= 0
        cont = jax.lax.dynamic_slice(
            buf, (jnp.maximum(cont_start, 0),), (K - 1,)
        )
        # no match at any n: draft repeats the last token (harmless;
        # accepted=0 still emits the one verified token)
        cont = jnp.where(found, cont, jnp.full((K - 1,), last_tok))
        return cont

    def cond(state):
        buf, n_emit, pos, cache, done, fstate, rounds = state
        return (~done) & (n_emit < gen_len)

    def body(state):
        buf, n_emit, pos, cache, done, fstate, rounds = state
        n_buf = P + n_emit
        last = buf[n_buf - 1]
        draft = find_draft(buf, n_buf, last)
        if use_fsm:
            # walk the DFA along the draft, repairing illegal tokens to
            # the first legal one (liveness: every state has >=1);
            # st[i] = state after tokens_k[:i+1] = the mask state for
            # position i's prediction
            def walk(s, d):
                ok = fsm_next[s, d] >= 0
                d = jnp.where(
                    ok, d, jnp.argmax(fsm_next[s] >= 0).astype(jnp.int32)
                )
                ns = fsm_next[s, d]
                return ns, (d, ns)

            _, (draft, st_tail) = jax.lax.scan(walk, fstate, draft)
            st = jnp.concatenate([fstate[None], st_tail])[:K]
        else:
            st = None
        tokens_k = jnp.concatenate([last[None], draft])  # [K]
        logits, cache = _verify_step(params, args, cache, tokens_k, pos)
        lg = mask_logits(logits, st)
        if temperature > 0.0:
            from a3vlm_tpu.ops.sampling import sample_token

            # position i emits token index n_emit + i -> key sub_{n_emit+i}
            keys = jax.lax.dynamic_slice(sample_keys, (n_emit, 0), (K, 2))
            preds = jax.vmap(
                lambda k, row: sample_token(
                    k, row[None], temperature, top_p)[0]
            )(keys, lg).astype(jnp.int32)
        else:
            preds = jnp.argmax(lg, axis=-1).astype(jnp.int32)

        # accepted[i]: draft token i+1 matched pred i, all previous too
        match = preds[: K - 1] == draft
        accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
        if accept_cap is not None:
            caps = jnp.asarray(accept_cap, jnp.int32)
            accepted = jnp.minimum(
                accepted, caps[rounds % len(accept_cap)]
            )
        m = accepted + 1  # emitted this round
        m = jnp.minimum(m, gen_len - n_emit)

        # stop-token truncation: emit up to and including the first stop
        emit_idx = jnp.arange(K)
        is_stop = preds == stop_token
        first_stop = jnp.min(jnp.where(is_stop, emit_idx, K))
        m = jnp.minimum(m, first_stop + 1)
        done = first_stop < m

        if use_fsm:
            # DFA state after the LAST emitted token (m >= 1 always):
            # accepted positions i < m-1 land back on st[i+1]; only the
            # final emitted token can diverge from the draft walk
            fstate = jnp.maximum(fsm_next[st[m - 1], preds[m - 1]], 0)

        # write all K preds after the current end; only m count
        buf = jax.lax.dynamic_update_slice(buf, preds, (n_buf,))
        return buf, n_emit + m, pos + m, cache, done, fstate, rounds + 1

    first_is_stop = jnp.asarray(first_token, jnp.int32) == stop_token
    fstate0 = jnp.asarray(
        fsm_state0 if fsm_state0 is not None else 0, jnp.int32
    )
    buf, n_emit, pos, cache, done, _, rounds = jax.lax.while_loop(
        cond, body, (buf, jnp.int32(1), jnp.asarray(start_pos, jnp.int32),
                     cache, first_is_stop, fstate0, jnp.int32(0)),
    )
    out = jax.lax.dynamic_slice(buf, (P,), (gen_len,))
    # cache returned (and dropped by callers) purely to give the donated
    # input an output alias — see _generate_loop's note in generation.py
    # rounds = verify forwards run; n_emit / (rounds + 1) is the realized
    # tokens-per-forward including the prefill-argmax freebie
    return out, n_emit, cache, rounds


def greedy_reference(params, args, cache, start_pos, first_token,
                     gen_len, vocab_limit=None, stop_token=-1,
                     fsm_next=None, fsm_state0=0):
    """One-token-at-a-time greedy loop (the exactness oracle for tests);
    with ``fsm_next`` it is the grammar-constrained greedy oracle."""
    import numpy as np

    out = [int(first_token)]
    pos = int(start_pos)
    t = int(first_token)
    fstate = int(fsm_state0)
    while len(out) < gen_len and t != stop_token:
        logits, cache = llama.decode_step(
            params, args, cache, jnp.asarray([[t]], jnp.int32), pos
        )
        lg = np.asarray(logits[0], np.float32)
        if vocab_limit is not None:
            lg = lg[:vocab_limit]
        if fsm_next is not None:
            row = np.asarray(fsm_next)[fstate, : lg.shape[-1]]
            lg = np.where(row >= 0, lg, -np.inf)
        t = int(np.argmax(lg))
        if fsm_next is not None:
            fstate = max(int(np.asarray(fsm_next)[fstate, t]), 0)
        out.append(t)
        pos += 1
    return out
