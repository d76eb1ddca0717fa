"""Batched beam search, fully on-device.

The reference supports greedy only (python/whisper.py:235 argmax). This is a
whisper-style beam decoder (public semantics: per-utterance K beams, eot'd
hypotheses retired to a finished set, best-of-finished returned) built for
TPU: everything — candidate expansion, top-k, beam reordering of the KV
cache, finished-set merge — lives inside one jitted ``lax.while_loop`` with
static shapes. Beam state is plain arrays; cross-chip it shards over the
``data`` axis like the greedy path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

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
from .sampling import NEG_INF, RuleState, apply_rules


class BeamResult(NamedTuple):
    tokens: jnp.ndarray   # (B, n_text_ctx) best hypothesis, prompt included
    lengths: jnp.ndarray  # (B,) index of first eot after prompt
    scores: jnp.ndarray   # (B,) normalized log-prob of the winner
    all_tokens: jnp.ndarray  # (B, K, n_text_ctx) full finished set
    all_scores: jnp.ndarray  # (B, K)
    no_speech_prob: jnp.ndarray  # (B,) P(<|nospeech|>) at the sot position
    avg_logprob: jnp.ndarray     # (B,) alias of the winner's normalized score


def _norm_score(raw: jnp.ndarray, length: jnp.ndarray, alpha: Optional[float]):
    """GoogleNMT length penalty for alpha, else mean logprob."""
    length = jnp.maximum(length.astype(jnp.float32), 1.0)
    if alpha is None:
        return raw / length
    return raw / (((5.0 + length) / 6.0) ** alpha)


def _gather_beams(x: jnp.ndarray, src: jnp.ndarray, B: int, K: int) -> jnp.ndarray:
    """Reorder an (B*K, ...)-leading array by per-utterance beam indices."""
    shaped = x.reshape(B, K, *x.shape[1:])
    idx = src.reshape(B, K, *([1] * (x.ndim - 1)))
    out = jnp.take_along_axis(shaped, idx, axis=1)
    return out.reshape(B * K, *x.shape[1:])


def _gather_kv(cache: jnp.ndarray, src: jnp.ndarray, B: int, K: int) -> jnp.ndarray:
    """Beam-reorder axis 1 (the B*K stream axis) of a (L, B*K, ...) KV cache.

    A reshape-only ``take_along_axis`` — the earlier moveaxis(1, 0) round
    trip relaid the multi-hundred-MB cache out twice per decode step on top
    of the gather itself."""
    rest = cache.shape[2:]
    shaped = cache.reshape(cache.shape[0], B, K, *rest)
    idx = src.reshape(1, B, K, *([1] * len(rest)))
    out = jnp.take_along_axis(shaped, idx, axis=2)
    return out.reshape(cache.shape)


def _beam_from_kv(
    params: Params,
    cross_kv,             # 2- or 4-tuple, every leaf (L, B, ...)
    prompt: jnp.ndarray,  # (B, P) int32
    cfg: WhisperConfig,
    beam_size: int = 5,
    compute_dtype=jnp.float32,
    prompt_len: Optional[int] = None,
    max_tokens: Optional[int] = None,
    suppress_ids: Optional[jnp.ndarray] = None,
    timestamps: bool = False,
    apply_filters: bool = True,
    length_penalty: Optional[float] = None,
    prompt_pad: Optional[jnp.ndarray] = None,  # (B,) int32 left-pad lengths
    sot_index: int = 0,
    self_kv_quant: bool = False,
) -> BeamResult:
    """Beam loop against precomputed cross-KV (trace fn; see beam_search)."""
    B = prompt.shape[0]
    K = beam_size
    N = B * K
    P = prompt_len or prompt.shape[1]
    T = cfg.n_text_ctx
    limit = min(T, P + max_tokens) if max_tokens else T
    # bucketed self-KV: the loop never touches positions >= limit (static),
    # so the cache — and its per-step full read AND beam-reorder gather —
    # shrinks to the 128-rounded budget (see KVCache.create)
    kv_ctx = min(T, -(-limit // 128) * 128)
    eot = cfg.eot

    def filt(logits, state):
        if not (apply_filters or timestamps or suppress_ids is not None):
            return logits
        return apply_rules(logits, state, cfg, suppress_ids=suppress_ids,
                           timestamps=timestamps)

    # ---- prefill once per utterance, then tile per beam
    if self_kv_quant:
        from .models.model import QKVCache

        kv = QKVCache.create(cfg, B, ctx=kv_ctx)
    else:
        kv = KVCache.create(cfg, B, dtype=compute_dtype, ctx=kv_ctx)
    cache_cls = type(kv)
    logits, kv = decoder_forward(params, prompt, 0, kv, cross_kv, cfg,
                                 compute_dtype, pad=prompt_pad)
    no_speech_prob = jax.nn.softmax(logits[:, sot_index].astype(jnp.float32),
                                    axis=-1)[:, cfg.no_speech]

    def tile(x, axis):  # repeat each utterance K times along `axis`
        return jnp.repeat(x, K, axis=axis)

    # cross_kv is NOT tiled per beam: all K beams of an utterance share its
    # audio, so the decode loop folds beams into the cross-attention query
    # axis (decoder_forward(beam_k=K)) — K× less cross-KV HBM read AND
    # residency than the tiled layout, and no per-step beam reorder of it
    kv = cache_cls(tile(kv[0], 1), tile(kv[1], 1))
    pad_n = tile(prompt_pad, 0) if prompt_pad is not None else None

    tokens = jnp.full((N, T), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, tile(prompt.astype(jnp.int32), 0), (0, 0))

    rs = RuleState.create(N)
    # first expansion: top-K tokens of beam 0 (others start at -inf)
    lp0 = jax.nn.log_softmax(
        filt(tile(logits[:, -1], 0), rs).astype(jnp.float32), axis=-1)
    beam0_only = jnp.where(
        (jnp.arange(N) % K == 0)[:, None], lp0, NEG_INF).reshape(B, K * cfg.n_vocab)
    scores, flat_idx = jax.lax.top_k(beam0_only, K)  # (B, K)
    first_tok = (flat_idx % cfg.n_vocab).astype(jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, first_tok.reshape(N, 1), (0, P))
    rs = rs.advance(first_tok.reshape(N), cfg.timestamp_begin)
    # a beam that opened with eot is immediately finished
    opened_eot = first_tok == eot
    fin_scores = jnp.where(
        opened_eot, _norm_score(scores, jnp.ones_like(scores), length_penalty), NEG_INF)
    fin_tokens = tokens.reshape(B, K, T)
    fin_lens = jnp.full((B, K), P, jnp.int32)
    scores = jnp.where(opened_eot, NEG_INF, scores)

    class Carry(NamedTuple):
        tokens: jnp.ndarray      # (N, T)
        scores: jnp.ndarray      # (B, K) raw running logprob sums
        n_gen: jnp.ndarray       # (B, K) generated-token counts
        kv_k: jnp.ndarray
        kv_v: jnp.ndarray
        rs: RuleState
        fin_scores: jnp.ndarray  # (B, K) normalized
        fin_tokens: jnp.ndarray  # (B, K, T)
        fin_lens: jnp.ndarray    # (B, K)
        i: jnp.ndarray

    def cond(c: Carry):
        live = jnp.any(c.scores > NEG_INF / 2, axis=1)         # running beams left
        unfinished = jnp.any(c.fin_scores <= NEG_INF / 2, axis=1)  # finished set not full
        return jnp.logical_and(
            c.i < limit - 1, jnp.any(jnp.logical_and(live, unfinished)))

    def body(c: Carry):
        tok_i = jax.lax.dynamic_slice(c.tokens, (0, c.i), (N, 1))
        logits, new_kv = decoder_forward(
            params, tok_i, c.i, cache_cls(c.kv_k, c.kv_v), cross_kv, cfg,
            compute_dtype, pad=pad_n, beam_k=K)
        lp = jax.nn.log_softmax(
            filt(logits[:, 0], c.rs).astype(jnp.float32), axis=-1)  # (N, V)

        cand = c.scores.reshape(N, 1) + lp                     # (N, V)
        cand = jnp.where((c.scores.reshape(N) > NEG_INF / 2)[:, None], cand, NEG_INF)
        cand2k, idx2k = jax.lax.top_k(cand.reshape(B, K * cfg.n_vocab), 2 * K)
        tok2k = (idx2k % cfg.n_vocab).astype(jnp.int32)        # (B, 2K)
        src2k = (idx2k // cfg.n_vocab).astype(jnp.int32)

        is_eot = tok2k == eot
        n_gen2k = jnp.take_along_axis(c.n_gen, src2k, axis=1) + 1

        # --- retire eot candidates into the finished set (top-K of 3K)
        eot_norm = jnp.where(
            is_eot, _norm_score(cand2k, n_gen2k, length_penalty), NEG_INF)
        merged_scores = jnp.concatenate([c.fin_scores, eot_norm], axis=1)     # (B, 3K)
        cand_fin_tokens = jnp.take_along_axis(
            c.tokens.reshape(B, K, T), src2k[..., None], axis=1)              # (B, 2K, T)
        merged_tokens = jnp.concatenate([c.fin_tokens, cand_fin_tokens], axis=1)
        merged_lens = jnp.concatenate(
            [c.fin_lens, P + jnp.take_along_axis(c.n_gen, src2k, axis=1)], axis=1)
        fin_s, fin_idx = jax.lax.top_k(merged_scores, K)
        fin_t = jnp.take_along_axis(merged_tokens, fin_idx[..., None], axis=1)
        fin_l = jnp.take_along_axis(merged_lens, fin_idx, axis=1)

        # --- keep top-K non-eot candidates running
        run_scores = jnp.where(is_eot, NEG_INF, cand2k)
        new_scores, pick = jax.lax.top_k(run_scores, K)                        # (B, K)
        new_tok = jnp.take_along_axis(tok2k, pick, axis=1)
        new_src = jnp.take_along_axis(src2k, pick, axis=1)
        new_ngen = jnp.take_along_axis(n_gen2k, pick, axis=1)

        flat_src = new_src.reshape(N)
        tokens = _gather_beams(c.tokens, flat_src, B, K)
        tokens = jax.lax.dynamic_update_slice(tokens, new_tok.reshape(N, 1), (0, c.i + 1))
        kv_k = _gather_kv(new_kv[0], flat_src, B, K)
        kv_v = _gather_kv(new_kv[1], flat_src, B, K)
        rs = RuleState(
            last=_gather_beams(c.rs.last, flat_src, B, K),
            penult=_gather_beams(c.rs.penult, flat_src, B, K),
            max_ts=_gather_beams(c.rs.max_ts, flat_src, B, K),
            n_sampled=_gather_beams(c.rs.n_sampled, flat_src, B, K),
        ).advance(new_tok.reshape(N), cfg.timestamp_begin)

        return Carry(tokens, new_scores, new_ngen, kv_k, kv_v, rs,
                     fin_s, fin_t, fin_l, c.i + 1)

    init = Carry(
        tokens=tokens,
        scores=scores,
        n_gen=jnp.ones((B, K), jnp.int32),
        kv_k=kv[0],
        kv_v=kv[1],
        rs=rs,
        fin_scores=fin_scores,
        fin_tokens=fin_tokens,
        fin_lens=fin_lens,
        i=jnp.int32(P),
    )

    # The AOT TPU compiler's while_loop cost explodes with carry ARITY, so
    # the 13-leaf Carry is packed to 7 leaves at the loop boundary:
    # (B,K) float stats -> one (B,K,4) array, RuleState -> one (N,4) array.
    # n_gen/fin_lens are exact in f32 (<= n_text_ctx = 448 << 2^24).
    def pack(c: Carry):
        fp = jnp.stack([c.scores, c.n_gen.astype(jnp.float32),
                        c.fin_scores, c.fin_lens.astype(jnp.float32)], axis=2)
        rp = jnp.stack([c.rs.last, c.rs.penult, c.rs.max_ts, c.rs.n_sampled], axis=1)
        return (c.tokens, fp, c.kv_k, c.kv_v, rp, c.fin_tokens, c.i)

    def unpack(t) -> Carry:
        tokens_, fp, kv_k, kv_v, rp, fin_tokens_, i = t
        return Carry(
            tokens=tokens_, scores=fp[:, :, 0],
            n_gen=fp[:, :, 1].astype(jnp.int32),
            kv_k=kv_k, kv_v=kv_v,
            rs=RuleState(rp[:, 0], rp[:, 1], rp[:, 2], rp[:, 3]),
            fin_scores=fp[:, :, 2], fin_tokens=fin_tokens_,
            fin_lens=fp[:, :, 3].astype(jnp.int32), i=i)

    out = unpack(jax.lax.while_loop(
        lambda t: cond(unpack(t)),
        lambda t: pack(body(unpack(t))),
        pack(init)))

    # utterances with an empty finished set fall back to the best running beam
    run_norm = _norm_score(out.scores, out.n_gen, length_penalty)
    no_fin = jnp.all(out.fin_scores <= NEG_INF / 2, axis=1, keepdims=True)
    best_run = jnp.argmax(run_norm, axis=1)
    run_tokens = jnp.take_along_axis(
        out.tokens.reshape(B, K, T), best_run[:, None, None], axis=1)[:, 0]
    run_lens = out.i + 1  # ran to the cap
    fin_scores = jnp.where(no_fin, jnp.take_along_axis(run_norm, best_run[:, None], 1),
                           out.fin_scores)
    best = jnp.argmax(fin_scores, axis=1)
    best_tokens = jnp.take_along_axis(
        out.fin_tokens, best[:, None, None], axis=1)[:, 0]
    best_tokens = jnp.where(no_fin, run_tokens, best_tokens)
    best_lens = jnp.where(
        no_fin[:, 0], run_lens,
        jnp.take_along_axis(out.fin_lens, best[:, None], axis=1)[:, 0])
    best_scores = jnp.take_along_axis(fin_scores, best[:, None], axis=1)[:, 0]

    # ensure the buffer is eot-clean after the hypothesis
    pos = jnp.arange(T)[None, :]
    best_tokens = jnp.where(pos >= best_lens[:, None], eot, best_tokens)
    return BeamResult(best_tokens, best_lens, best_scores,
                      out.fin_tokens, out.fin_scores,
                      no_speech_prob=no_speech_prob, avg_logprob=best_scores)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam_size", "compute_dtype", "prompt_len",
                     "max_tokens", "timestamps", "apply_filters",
                     "length_penalty", "kv_quant", "sot_index",
                     "self_kv_quant"),
)
def beam_search(
    params: Params,
    mel: jnp.ndarray,     # (B, n_mels, 3000)
    prompt: jnp.ndarray,  # (B, P) int32
    cfg: WhisperConfig,
    beam_size: int = 5,
    compute_dtype=jnp.float32,
    prompt_len: Optional[int] = None,
    max_tokens: Optional[int] = None,
    suppress_ids: Optional[jnp.ndarray] = None,
    timestamps: bool = False,
    apply_filters: bool = True,
    length_penalty: Optional[float] = None,
    kv_quant: bool = False,
    prompt_pad: Optional[jnp.ndarray] = None,
    sot_index: int = 0,
    self_kv_quant: bool = False,
) -> BeamResult:
    """Encoder + beam loop in one compiled program (see module docstring)."""
    audio = encoder_forward(params, mel, cfg, compute_dtype)
    cross_kv = compute_cross_kv(params, audio, cfg, compute_dtype)
    if kv_quant:
        from .models.model import quantize_cross_kv

        cross_kv = quantize_cross_kv(cross_kv)
    return _beam_from_kv(
        params, cross_kv, prompt, cfg, beam_size=beam_size,
        compute_dtype=compute_dtype, prompt_len=prompt_len,
        max_tokens=max_tokens, suppress_ids=suppress_ids,
        timestamps=timestamps, apply_filters=apply_filters,
        length_penalty=length_penalty, prompt_pad=prompt_pad,
        sot_index=sot_index, self_kv_quant=self_kv_quant)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam_size", "compute_dtype", "prompt_len",
                     "max_tokens", "timestamps", "apply_filters",
                     "length_penalty", "sot_index", "self_kv_quant"),
)
def beam_search_kv(
    params: Params,
    cross_kv,             # 2- or 4-tuple from decode.encode_cross_kv
    prompt: jnp.ndarray,  # (B, P) int32
    cfg: WhisperConfig,
    beam_size: int = 5,
    compute_dtype=jnp.float32,
    prompt_len: Optional[int] = None,
    max_tokens: Optional[int] = None,
    suppress_ids: Optional[jnp.ndarray] = None,
    timestamps: bool = False,
    apply_filters: bool = True,
    length_penalty: Optional[float] = None,
    prompt_pad: Optional[jnp.ndarray] = None,
    sot_index: int = 0,
    self_kv_quant: bool = False,
) -> BeamResult:
    """beam_search against precomputed cross-KV — shares one encoder pass
    with language detection and the pipeline's retry ladder."""
    return _beam_from_kv(
        params, cross_kv, prompt, cfg, beam_size=beam_size,
        compute_dtype=compute_dtype, prompt_len=prompt_len,
        max_tokens=max_tokens, suppress_ids=suppress_ids,
        timestamps=timestamps, apply_filters=apply_filters,
        length_penalty=length_penalty, prompt_pad=prompt_pad,
        sot_index=sot_index, self_kv_quant=self_kv_quant)
