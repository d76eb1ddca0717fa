"""Logit filtering rules for decoding: suppression + timestamp grammar.

The reference decodes with bare argmax only (python/whisper.py:235-253) and
carries `non_speech_tokens` / timestamp metadata in its config without using
them. This module implements the full OpenAI-Whisper decoding rule set
(public semantics) as vectorized, jit-compatible transforms over (N, V)
logits, driven by O(1) per-stream state instead of re-scanning the token
buffer every step:

- suppress list (non-speech tokens, sot-family, notimestamps)
- blank suppression at the first sampled position
- timestamp grammar: pairs, monotonicity, initial-timestamp cap, and the
  "timestamp wins if its total mass beats every text token" rule
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig

# np scalar, NOT jnp: a module-level jnp value is a concrete device array
# that every trace capturing it const-lifts into the compiled executable's
# input list — and the XLA-CPU SPMD execution path then invokes the program
# with the wrong buffer arity (round-4 dryrun. np scalars embed as literals.)
NEG_INF = np.float32(-1e30)


def build_suppress_ids(cfg: WhisperConfig, tokenizer=None,
                       suppress_nonspeech: bool = True) -> np.ndarray:
    """Token ids always suppressed during sampling (OpenAI defaults).

    Includes the special-token family and, if a tokenizer is given, its
    non-speech symbol list (reference carries the same list as metadata,
    python/whisper_tokenizer.py:241-275).
    """
    ids = {
        cfg.transcribe,
        cfg.translate,
        cfg.sot,
        cfg.sot_prev,
        cfg.sot_lm,
        cfg.no_speech,
    }
    ids.update(cfg.lang_token_start + i for i in range(cfg.num_languages))
    if suppress_nonspeech and tokenizer is not None:
        ids.update(tokenizer.non_speech_tokens)
    ids.discard(cfg.eot)
    return np.asarray(sorted(ids), np.int32)


class RuleState(NamedTuple):
    """Per-stream incremental state for timestamp rules. All (N,)."""

    last: jnp.ndarray        # previous sampled token
    penult: jnp.ndarray      # token before that
    max_ts: jnp.ndarray      # highest timestamp token emitted so far (or 0)
    n_sampled: jnp.ndarray   # number of tokens sampled after the prompt

    @classmethod
    def create(cls, n: int) -> "RuleState":
        # four distinct buffers: max_ts/n_sampled sharing one array would
        # alias two donated arguments when a pristine state is fed straight
        # to the step program (engine warmup does exactly that)
        return cls(jnp.full((n,), -1, jnp.int32),
                   jnp.full((n,), -1, jnp.int32),
                   jnp.zeros((n,), jnp.int32),
                   jnp.zeros((n,), jnp.int32))

    def advance(self, sampled: jnp.ndarray, timestamp_begin: int) -> "RuleState":
        sampled = sampled.astype(jnp.int32)
        return RuleState(
            last=sampled,
            penult=self.last,
            max_ts=jnp.where(sampled >= timestamp_begin,
                             jnp.maximum(self.max_ts, sampled), self.max_ts),
            n_sampled=self.n_sampled + 1,
        )


def apply_rules(
    logits: jnp.ndarray,  # (N, V) fp32
    state: RuleState,
    cfg: WhisperConfig,
    suppress_ids: Optional[jnp.ndarray] = None,
    timestamps: bool = False,
    max_initial_timestamp_index: int = 50,  # 1.0 s, OpenAI default
) -> jnp.ndarray:
    """Return filtered logits. Pure function of logits + per-stream state."""
    N, V = logits.shape
    vocab = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    ts0 = cfg.timestamp_begin
    eot = cfg.eot

    if suppress_ids is not None:
        logits = logits.at[:, suppress_ids].set(NEG_INF)
    # notimestamps token is never a valid sample
    logits = logits.at[:, cfg.no_timestamps].set(NEG_INF)

    first = (state.n_sampled == 0)[:, None]  # (N, 1)
    # blank suppression at the first sampled position (space & eot)
    blank = (vocab == cfg.blank_id) | (vocab == eot)
    logits = jnp.where(first & blank, NEG_INF, logits)

    if not timestamps:
        # no-timestamps mode: the whole timestamp range is invalid
        logits = jnp.where(vocab >= ts0, NEG_INF, logits)
        return logits

    is_ts = vocab >= ts0
    is_text = vocab < eot
    last_was_ts = (state.last >= ts0)[:, None]
    penult_was_ts = ((state.penult >= ts0) | (state.penult < 0))[:, None]

    # pairs rule: [ts, ts] -> must be text; [text, ts] -> must be ts or eot
    logits = jnp.where(last_was_ts & penult_was_ts & is_ts, NEG_INF, logits)
    logits = jnp.where(last_was_ts & ~penult_was_ts & is_text, NEG_INF, logits)

    # monotonicity: suppress timestamps below the running max
    # (strictly below max when mid-pair, i.e. allow repeating the same stamp
    # to close a pair; strictly at-or-below otherwise)
    floor = jnp.where(
        (state.last >= ts0) & (state.penult < ts0) & (state.penult >= 0),
        state.max_ts,
        state.max_ts + 1,
    )
    floor = jnp.maximum(floor, ts0)
    logits = jnp.where(is_ts & (vocab < floor[:, None]), NEG_INF, logits)

    # first sampled token must be a timestamp, capped at max_initial_timestamp
    # (OpenAI masks the whole sub-timestamp range here, specials included)
    logits = jnp.where(first & ~is_ts, NEG_INF, logits)
    if max_initial_timestamp_index is not None:
        cap = ts0 + max_initial_timestamp_index
        logits = jnp.where(first & is_ts & (vocab > cap), NEG_INF, logits)

    # if total timestamp probability mass beats every text token, force a
    # timestamp (OpenAI ApplyTimestampRules last clause)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_mass = jax.nn.logsumexp(jnp.where(is_ts, logprobs, NEG_INF), axis=-1)
    text_max = jnp.max(jnp.where(~is_ts, logprobs, NEG_INF), axis=-1)
    force_ts = (ts_mass > text_max)[:, None]
    logits = jnp.where(force_ts & ~is_ts, NEG_INF, logits)
    return logits
