"""Speculative greedy decoding: a cheap draft model proposes, the target
verifies gamma+1 positions per pass.

Beyond-parity capability (the reference decodes strictly one token per NPU
call, python/whisper.py:241-253; it has no draft/verify machinery of any
kind). TPU-first shape: the whole accept/reject loop — draft steps, the
width-(gamma+1) verify window, per-row acceptance, KV bookkeeping — is ONE
jitted ``lax.while_loop`` over static shapes; rows sit at independent
offsets (``decoder_window_multipos``) so a batch never lock-steps on its
slowest row's acceptance.

Exactness invariant: with ``temperature=0`` the emitted token sequence is
IDENTICAL to ``greedy_decode_kv`` on the target model, for ANY draft —
a draft token is only kept when it equals the target's own argmax given
the same validated prefix, and on the first mismatch the target's argmax
(the "bonus" token) is emitted instead, which is exactly the token plain
greedy would have produced. Draft quality affects only the acceptance
rate (speed), never the output. (Caveat: the verify pass computes logits
in width-(gamma+1) windows, so float accumulation order differs from the
1-wide greedy step; an argmax can flip only on a numerical tie.)

KV bookkeeping (no rollback copies): both caches maintain the invariant
"every validated token except the last has been processed". Rejected
draft positions leave stale KV past the validated frontier; the causal
mask (key_pos <= query_pos) hides them, and the next round's window —
which always starts at the frontier — overwrites them. Whisper's fixed
n_text_ctx=448 makes paged caches unnecessary.

Draft pairing: any two Whisper checkpoints with the same vocabulary
(e.g. distil-large-v3 drafting for large-v3 — the distil family shares
the tokenizer; config.py carries both). The break-even acceptance rate
for a draft costing c_d per step and a verify window costing c_v(W) is
alpha* such that expected tokens/round (see benchmarks/spec_bench.py)
exceeds (gamma*c_d + c_v)/c_step — measured, not assumed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import WhisperConfig
from .models.model import (
    KVCache,
    Params,
    QKVCache,
    decoder_forward,
    decoder_step_multipos,
    decoder_window_multipos,
)


class SpecResult(NamedTuple):
    tokens: jnp.ndarray          # (B, n_text_ctx) int32, prompt included, eot-padded
    lengths: jnp.ndarray         # (B,) int32: index of first eot after prompt
    no_speech_prob: jnp.ndarray  # (B,) fp32 (target prefill, sot position)
    avg_logprob: jnp.ndarray     # (B,) fp32 mean TARGET logprob of emitted tokens
    accepted: jnp.ndarray        # () i32: draft tokens accepted (all rows)
    drafted: jnp.ndarray         # () i32: draft tokens proposed (live rows)
    rounds: jnp.ndarray          # () i32: verify rounds run


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "gamma", "compute_dtype",
                     "prompt_len", "max_tokens", "self_kv_quant",
                     "sot_index"),
)
def speculative_decode_kv(
    params: Params,
    cross_kv,                    # target cross-KV (2- or 4-tuple)
    draft_params: Params,
    draft_cross_kv,              # draft cross-KV (2- or 4-tuple)
    prompt: jnp.ndarray,         # (B, P) int32 — shared (same tokenizer/vocab)
    cfg: WhisperConfig,
    draft_cfg: WhisperConfig,
    gamma: int = 4,
    compute_dtype=jnp.float32,
    prompt_len: Optional[int] = None,
    max_tokens: Optional[int] = None,
    self_kv_quant: bool = False,
    sot_index: int = 0,
) -> SpecResult:
    """Greedy speculative decode against precomputed cross-KV for both
    models (one encoder pass each; the draft's encoder runs on the same
    mel — see benchmarks/spec_bench.py for the end-to-end wrapper).

    Supports the flagship cache configs (int8 cross-KV tuples, int8
    packed self-KV). Quality filters (``apply_filters``/``timestamps``/
    ``suppress_ids``) are sequential-state machinery and are not applied
    here — use plain greedy when the OpenAI suppression grammar is
    needed (pipeline default); the flagship bench path (argmax-only)
    maps 1:1.
    """
    assert cfg.n_vocab == draft_cfg.n_vocab, (
        "draft and target must share a vocabulary/tokenizer")
    assert gamma >= 1
    B = prompt.shape[0]
    P = prompt_len or prompt.shape[1]
    T = cfg.n_text_ctx
    limit = min(T, P + max_tokens) if max_tokens else T
    W = gamma + 1
    # window writes reach offset+gamma-1 < limit+gamma: size both caches
    # past that so no write position ever clips (see window scatter note)
    kv_ctx = min(T, -(-(limit + gamma) // 128) * 128)
    eot = cfg.eot
    dt = compute_dtype

    if self_kv_quant:
        kv_t = QKVCache.create(cfg, B, ctx=kv_ctx)
        kv_d = QKVCache.create(draft_cfg, B, ctx=kv_ctx)
    else:
        kv_t = KVCache.create(cfg, B, dtype=dt, ctx=kv_ctx)
        kv_d = KVCache.create(draft_cfg, B, dtype=dt, ctx=kv_ctx)

    tokens = jnp.full((B, T), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32),
                                          (0, 0))

    # prefill BOTH models; the first token comes from the target (greedy
    # semantics); the draft's prefill logit is discarded — its cache now
    # holds the prompt, which is all the invariant needs
    logits_t, kv_t = decoder_forward(params, prompt, 0, kv_t, cross_kv, cfg, dt)
    _, kv_d = decoder_forward(draft_params, prompt, 0, kv_d, draft_cross_kv,
                              draft_cfg, dt)
    no_speech_prob = jax.nn.softmax(
        logits_t[:, sot_index], axis=-1)[:, cfg.no_speech]
    lp0 = jax.nn.log_softmax(logits_t[:, -1].astype(jnp.float32), axis=-1)
    first = jnp.argmax(lp0, axis=-1).astype(jnp.int32)
    first_lp = jnp.take_along_axis(lp0, first[:, None], axis=1)[:, 0]
    tokens = jax.lax.dynamic_update_slice(tokens, first[:, None], (0, P))

    off = jnp.full((B,), P + 1, jnp.int32)        # validated token count
    done = jnp.logical_or(first == eot, off >= limit)
    # fstate rows: [done, sum_logprob, n_sampled] (B, 3) f32 — same packing
    # rationale as decode._greedy_from_kv (carry arity is the AOT TPU
    # compiler's compile-time killer)
    fstate = jnp.stack([done.astype(jnp.float32), first_lp,
                        jnp.ones((B,), jnp.float32)], axis=1)
    stats = jnp.zeros((3,), jnp.int32)            # [accepted, drafted, rounds]
    barange = jnp.arange(B)
    jarange = jnp.arange(W)

    def cond(state):
        fstate = state[6]
        return jnp.logical_not(jnp.all(fstate[:, 0] > 0.5))

    def body(state):
        tokens, ktk, ktv, kdk, kdv, off, fstate, stats = state
        kvt = type(kv_t)(ktk, ktv)
        kvd = type(kv_d)(kdk, kdv)
        done = fstate[:, 0] > 0.5
        alive = jnp.logical_not(done)

        # ---- draft: propose gamma tokens from the frontier. The FIRST
        # feed is a width-2 window over the last TWO validated tokens:
        # a fully-accepted previous round leaves the draft cache one
        # position short of the invariant (the last accepted proposal
        # g_gamma was generated but never fed), and the width-2 feed
        # repairs that hole every round — feeding an already-cached
        # position just rewrites the same values. Remaining gamma-1
        # proposals are plain 1-wide steps.
        y0 = jnp.stack([tokens[barange, jnp.maximum(off - 2, 0)],
                        tokens[barange, off - 1]], axis=1)
        dlog0, kvd = decoder_window_multipos(
            draft_params, y0, off - 2, kvd, draft_cross_kv, draft_cfg, dt)
        cur = jnp.argmax(dlog0[:, 1], axis=-1).astype(jnp.int32)
        g = jnp.zeros((B, gamma), jnp.int32)
        g = g.at[:, 0].set(cur)
        for j in range(1, gamma):
            dlogits, kvd = decoder_step_multipos(
                draft_params, cur, off - 1 + j, kvd, draft_cross_kv,
                draft_cfg, dt)
            cur = jnp.argmax(dlogits, axis=-1).astype(jnp.int32)
            g = g.at[:, j].set(cur)

        # ---- verify: one width-(gamma+1) target window from the frontier
        y = jnp.concatenate([tokens[barange, off - 1][:, None], g], axis=1)
        vlogits, kvt = decoder_window_multipos(
            params, y, off - 1, kvt, cross_kv, cfg, dt)
        vlp = jax.nn.log_softmax(vlogits.astype(jnp.float32), axis=-1)
        t = jnp.argmax(vlp, axis=-1).astype(jnp.int32)       # (B, W)
        t_lp = jnp.take_along_axis(vlp, t[..., None], axis=-1)[..., 0]

        # acceptance: draft token j+1 survives iff it equals the target's
        # argmax t_j; emitted tokens are then t[:, :a+1] (accepted == the
        # matching t's, plus the bonus t_a)
        match = (g == t[:, :gamma])
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        n_new = a + 1
        # stop at the first emitted eot / the token budget
        is_eot = t == eot
        first_eot = jnp.min(jnp.where(is_eot, jarange[None, :], W), axis=1)
        n_new = jnp.minimum(n_new, first_eot + 1)
        n_new = jnp.minimum(n_new, limit - off)
        n_new = jnp.where(done, 0, n_new)

        valid = jarange[None, :] < n_new[:, None]            # (B, W)
        pos = off[:, None] + jarange[None, :]
        # invalid entries scatter OUT OF BOUNDS and drop — clipping them
        # to T-1 instead would duplicate-write that slot and the stale
        # value could win over the real token (XLA scatter picks an
        # arbitrary duplicate)
        tokens = tokens.at[barange[:, None],
                           jnp.where(valid, pos, T)].set(t, mode="drop")

        new_off = off + n_new
        hit_eot = jnp.any(jnp.logical_and(valid, is_eot), axis=1)
        new_done = jnp.logical_or(done,
                                  jnp.logical_or(hit_eot, new_off >= limit))
        fstate = jnp.stack([
            new_done.astype(jnp.float32),
            fstate[:, 1] + jnp.sum(jnp.where(valid, t_lp, 0.0), axis=1),
            fstate[:, 2] + n_new.astype(jnp.float32),
        ], axis=1)
        stats = stats + jnp.stack([
            jnp.sum(jnp.where(done, 0, jnp.minimum(a, n_new))),
            jnp.sum(jnp.where(done, 0, gamma)),
            jnp.int32(1)])
        return (tokens, kvt[0], kvt[1], kvd[0], kvd[1], new_off, fstate,
                stats)

    state = (tokens, kv_t[0], kv_t[1], kv_d[0], kv_d[1], off, fstate, stats)
    tokens, _, _, _, _, off, fstate, stats = jax.lax.while_loop(
        cond, body, state)

    # eot-pad past each row's validated frontier so the buffer reads like
    # greedy_decode's (junk from rejected windows must not look like text)
    pos = jnp.arange(T)[None, :]
    tokens = jnp.where(jnp.logical_and(pos >= off[:, None], pos >= P),
                       eot, tokens)
    is_eot = tokens == eot
    first_eot = jnp.min(
        jnp.where(jnp.logical_and(is_eot, pos >= P), pos, T), axis=1)
    return SpecResult(
        tokens=tokens, lengths=first_eot, no_speech_prob=no_speech_prob,
        avg_logprob=fstate[:, 1] / jnp.maximum(fstate[:, 2], 1.0),
        accepted=stats[0], drafted=stats[1], rounds=stats[2])
