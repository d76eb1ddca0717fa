"""Batched autoregressive decoding, fully on-device.

The reference drives generation from the host: one NPU call per token, with
the entire 448-slot KV cache shipped host->device every step
(python/whisper.py:241-253; cpp/src/Whisper.cpp:290-346). Here the whole
loop — prefill, per-token decoder step, KV update, argmax, stop condition —
is a single jitted ``lax.while_loop``; the host sees only the final token
buffer.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .models.model import (
    KVCache,
    Params,
    compute_cross_kv,
    decoder_forward,
    encoder_forward,
)


class GreedyResult(NamedTuple):
    tokens: jnp.ndarray  # (B, n_text_ctx) int32, prompt included, eot-padded
    lengths: jnp.ndarray  # (B,) int32: index of first eot after prompt (= total length)
    no_speech_prob: jnp.ndarray  # (B,) fp32: P(<|nospeech|>) at the sot position
    avg_logprob: jnp.ndarray  # (B,) fp32: mean logprob of sampled tokens (incl. eot)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "kv_quant"))
def encode_cross_kv(
    params: Params,
    mel: jnp.ndarray,  # (B, n_mels, 3000)
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
    kv_quant: bool = False,
):
    """Encoder + per-layer cross-attention K/V in one compiled program.

    The reference bakes the cross-KV projections into its encoder graph so
    they run once per utterance (model_convert/export_onnx.py:205-213); this
    is the same contract as a standalone jit so language detection, decoding
    and the temperature-retry ladder can all share ONE encoder pass
    (the engine does the same at serving/engine.py). Returns a 2-tuple
    (k, v) each (L, B, H, Ta, dh), or the 4-tuple int8 form when
    ``kv_quant`` (see models.model.quantize_cross_kv).
    """
    audio = encoder_forward(params, mel, cfg, compute_dtype)
    cross_kv = compute_cross_kv(params, audio, cfg, compute_dtype)
    if kv_quant:
        from .models.model import quantize_cross_kv

        cross_kv = quantize_cross_kv(cross_kv)
    return cross_kv


def index_cross_kv(cross_kv, idx):
    """Select a batch subset of a (possibly int8-quantized) cross-KV tuple.

    Every leaf is (L, B, ...) — batch is axis 1. Used by the pipeline's
    temperature-retry ladder to re-decode only the failed utterances without
    re-running the encoder.
    """
    return tuple(a[:, idx] for a in cross_kv)


def _greedy_from_kv(
    params: Params,
    cross_kv,
    prompt: jnp.ndarray,
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
    prompt_len: Optional[int] = None,
    max_tokens: Optional[int] = None,
    suppress_ids: Optional[jnp.ndarray] = None,
    timestamps: bool = False,
    apply_filters: bool = False,
    temperature: float = 0.0,
    seed: int = 0,
    prompt_pad: Optional[jnp.ndarray] = None,
    sot_index: int = 0,
    self_kv_quant: bool = False,
) -> GreedyResult:
    """Prefill + greedy token loop against precomputed cross-KV (trace fn)."""
    from .sampling import RuleState, apply_rules

    B = prompt.shape[0]
    P = prompt_len or prompt.shape[1]
    T = cfg.n_text_ctx
    limit = min(T, P + max_tokens) if max_tokens else T
    # the loop never writes or attends past `limit` (static), so the KV cache
    # position axis shrinks to the 128-rounded budget: every decode step then
    # streams only the reachable prefix of the self-KV (3.5x less at the
    # flagship turbo-B64 64-token config)
    kv_ctx = min(T, -(-limit // 128) * 128)
    eot = cfg.eot
    use_rules = apply_filters or timestamps or suppress_ids is not None

    def filt(logits, state):
        if not use_rules:
            return logits
        return apply_rules(logits, state, cfg, suppress_ids=suppress_ids,
                           timestamps=timestamps)

    if self_kv_quant:
        from .models.model import QKVCache

        kv = QKVCache.create(cfg, B, ctx=kv_ctx)
    else:
        kv = KVCache.create(cfg, B, dtype=compute_dtype, ctx=kv_ctx)
    cache_cls = type(kv)

    tokens = jnp.full((B, T), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))

    # prefill all prompt positions in one pass
    logits, kv = decoder_forward(params, prompt, 0, kv, cross_kv, cfg,
                                 compute_dtype, pad=prompt_pad)
    # OpenAI-style no-speech probability: softmax at the sot position
    # (the reference carries the no_speech id but never uses it)
    no_speech_prob = jax.nn.softmax(logits[:, sot_index], axis=-1)[:, cfg.no_speech]
    rs = RuleState.create(B)
    stochastic = bool(temperature and temperature > 0)
    key = jax.random.PRNGKey(seed)  # unused (dead-code-eliminated) if greedy

    def sample(logits_f, step_key):
        """argmax at temperature 0, categorical otherwise; returns
        (token, its logprob under the filtered distribution)."""
        lp = jax.nn.log_softmax(logits_f.astype(jnp.float32), axis=-1)
        if stochastic:
            tok = jax.random.categorical(step_key, lp / temperature, axis=-1)
        else:
            tok = jnp.argmax(lp, axis=-1)
        tok = tok.astype(jnp.int32)
        return tok, jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0]

    if stochastic:
        key, sub = jax.random.split(key)
    else:
        sub = key
    first, first_lp = sample(filt(logits[:, -1], rs), sub)
    rs = rs.advance(first, cfg.timestamp_begin)
    tokens = jax.lax.dynamic_update_slice(tokens, first[:, None], (0, P))
    done = first == eot

    # The AOT TPU compiler's while_loop cost explodes with carry ARITY
    # (measured: 5 leaves ~3 min, 9+ leaves >20 min for the same model), so
    # all small per-stream state is packed into two (B, k) arrays:
    #   fstate: [done, sum_logprob, n_sampled]            (B, 3) f32
    #   istate: [last, penult, max_ts, n_sampled_rules]   (B, 4) i32 (rules only)
    fstate = jnp.stack(
        [done.astype(jnp.float32), first_lp, jnp.ones((B,), jnp.float32)], axis=1)

    def pack_rs(r: RuleState):
        return jnp.stack([r.last, r.penult, r.max_ts, r.n_sampled], axis=1)

    def unpack_rs(a):
        return RuleState(a[:, 0], a[:, 1], a[:, 2], a[:, 3])

    carry = [tokens, kv[0], kv[1], jnp.int32(P), fstate]
    if use_rules:
        carry.append(pack_rs(rs))
    if stochastic:
        carry.append(key)
    carry = tuple(carry)

    def cond(state):
        i, fstate = state[3], state[4]
        return jnp.logical_and(
            i < limit - 1, jnp.logical_not(jnp.all(fstate[:, 0] > 0.5)))

    def body(state):
        tokens, k, v, i, fstate = state[:5]
        rest = list(state[5:])
        rs = unpack_rs(rest[0]) if use_rules else RuleState.create(B)
        done = fstate[:, 0] > 0.5

        tok_i = jax.lax.dynamic_slice(tokens, (0, i), (B, 1))
        logits, new_kv = decoder_forward(
            params, tok_i, i, cache_cls(k, v), cross_kv, cfg, compute_dtype,
            pad=prompt_pad,
        )
        if stochastic:
            key2, sub = jax.random.split(rest[-1])
        else:
            sub = None
        nxt, lp = sample(filt(logits[:, 0], rs), sub)
        nxt = jnp.where(done, eot, nxt)
        alive = jnp.logical_not(done)
        new_done = jnp.logical_or(done, nxt == eot)
        fstate = jnp.stack([
            new_done.astype(jnp.float32),
            fstate[:, 1] + jnp.where(alive, lp, 0.0),
            fstate[:, 2] + alive.astype(jnp.float32),
        ], axis=1)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))

        out = [tokens, new_kv[0], new_kv[1], i + 1, fstate]
        if use_rules:
            out.append(pack_rs(rs.advance(nxt, cfg.timestamp_begin)))
        if stochastic:
            out.append(key2)
        return tuple(out)

    final = jax.lax.while_loop(cond, body, carry)
    tokens, fstate = final[0], final[4]
    sum_lp, n_lp = fstate[:, 1], fstate[:, 2]

    is_eot = tokens == eot
    pos = jnp.arange(T)[None, :]
    first_eot = jnp.min(jnp.where(jnp.logical_and(is_eot, pos >= P), pos, T), axis=1)
    return GreedyResult(tokens=tokens, lengths=first_eot,
                        no_speech_prob=no_speech_prob,
                        avg_logprob=sum_lp / jnp.maximum(n_lp, 1.0))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "prompt_len", "max_tokens",
                     "timestamps", "apply_filters", "kv_quant",
                     "temperature", "seed", "sot_index", "self_kv_quant"),
)
def greedy_decode(
    params: Params,
    mel: jnp.ndarray,  # (B, n_mels, 3000)
    prompt: jnp.ndarray,  # (B, P) int32 — usually [sot, lang, task, no_ts]
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
    prompt_len: Optional[int] = None,
    max_tokens: Optional[int] = None,
    suppress_ids: Optional[jnp.ndarray] = None,
    timestamps: bool = False,
    apply_filters: bool = False,
    kv_quant: bool = False,
    temperature: float = 0.0,
    seed: int = 0,
    prompt_pad: Optional[jnp.ndarray] = None,  # (B,) int32 left-pad lengths
    sot_index: int = 0,
    self_kv_quant: bool = False,
) -> GreedyResult:
    """Encoder + prefill + greedy token loop in one compiled program.

    Matches the reference's decode semantics (greedy argmax, stop at eot or
    n_text_ctx, python/whisper.py:224-253) with batching the reference lacks
    (batch hardcoded to 1 at python/whisper.py:192). With
    ``apply_filters``/``timestamps`` the full OpenAI suppression/timestamp
    grammar (whisper_tpu.sampling) runs on-device each step.

    ``prompt_pad`` enables condition-on-previous-text: per-stream prompts
    ``[sot_prev, *prev_tokens, sot, lang, task]`` of differing lengths are
    right-aligned in the (B, P) prompt with left padding that is masked out
    of attention and skipped in positional indexing (see
    models.model.decoder_forward). ``sot_index`` is the column of the sot
    token (where the no-speech probability is read, OpenAI semantics).
    """
    audio = encoder_forward(params, mel, cfg, compute_dtype)
    cross_kv = compute_cross_kv(params, audio, cfg, compute_dtype)
    if kv_quant:
        from .models.model import quantize_cross_kv

        cross_kv = quantize_cross_kv(cross_kv)
    return _greedy_from_kv(
        params, cross_kv, prompt, cfg, compute_dtype=compute_dtype,
        prompt_len=prompt_len, max_tokens=max_tokens,
        suppress_ids=suppress_ids, timestamps=timestamps,
        apply_filters=apply_filters, temperature=temperature, seed=seed,
        prompt_pad=prompt_pad, sot_index=sot_index,
        self_kv_quant=self_kv_quant)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "prompt_len", "max_tokens",
                     "timestamps", "apply_filters", "temperature", "seed",
                     "sot_index", "self_kv_quant"),
)
def greedy_decode_kv(
    params: Params,
    cross_kv,  # 2- or 4-tuple from encode_cross_kv
    prompt: jnp.ndarray,
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
    prompt_len: Optional[int] = None,
    max_tokens: Optional[int] = None,
    suppress_ids: Optional[jnp.ndarray] = None,
    timestamps: bool = False,
    apply_filters: bool = False,
    temperature: float = 0.0,
    seed: int = 0,
    prompt_pad: Optional[jnp.ndarray] = None,
    sot_index: int = 0,
    self_kv_quant: bool = False,
) -> GreedyResult:
    """greedy_decode against precomputed cross-KV (one encoder pass can feed
    language detection, decode AND the retry ladder — the reference has no
    equivalent reuse; its closest analog is the DMA'd cross-KV handoff at
    cpp/src/Whisper.cpp:260-288)."""
    return _greedy_from_kv(
        params, cross_kv, prompt, cfg, compute_dtype=compute_dtype,
        prompt_len=prompt_len, max_tokens=max_tokens,
        suppress_ids=suppress_ids, timestamps=timestamps,
        apply_filters=apply_filters, temperature=temperature, seed=seed,
        prompt_pad=prompt_pad, sot_index=sot_index,
        self_kv_quant=self_kv_quant)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def detect_language(
    params: Params,
    mel: jnp.ndarray,  # (B, n_mels, 3000)
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Language-ID pass: one decoder step on [sot], softmax over lang tokens.

    The reference carries ``all_language_tokens`` metadata and documents an
    "auto" language (cpp/src/api/ax_whisper_api.h:40) but never implements
    detection; this provides it. Returns (lang_index (B,), probs (B, n_lang))
    where lang_index is an offset into the canonical language list.
    """
    audio = encoder_forward(params, mel, cfg, compute_dtype)
    cross_kv = compute_cross_kv(params, audio, cfg, compute_dtype)
    return _detect_language_from_kv(params, cross_kv, cfg, compute_dtype)


def _detect_language_from_kv(params, cross_kv, cfg, compute_dtype):
    B = cross_kv[0].shape[1]  # every leaf is (L, B, ...)
    kv = KVCache.create(cfg, B, dtype=compute_dtype, ctx=128)  # one step used
    sot = jnp.full((B, 1), cfg.sot, jnp.int32)
    logits, _ = decoder_forward(params, sot, 0, kv, cross_kv, cfg, compute_dtype)
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0], cfg.lang_token_start, cfg.num_languages, axis=-1
    )
    probs = jax.nn.softmax(lang_logits, axis=-1)
    return jnp.argmax(lang_logits, axis=-1), probs


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def detect_language_kv(
    params: Params,
    cross_kv,  # 2- or 4-tuple from encode_cross_kv
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detect_language against precomputed cross-KV — lets the pipeline run
    the encoder ONCE per batch and share it with the decode pass."""
    return _detect_language_from_kv(params, cross_kv, cfg, compute_dtype)


def extract_texts(result, prompt_len: int, tokenizer, timestamps: bool = False) -> list:
    """Host-side: token buffer -> list of decoded strings."""
    toks = np.asarray(result.tokens)
    lens = np.asarray(result.lengths)
    out = []
    for b in range(toks.shape[0]):
        ids = toks[b, prompt_len : lens[b]]
        if timestamps:
            out.append(tokenizer.decode_with_timestamps(ids).strip())
        else:
            out.append(tokenizer.decode(ids).strip())
    return out
