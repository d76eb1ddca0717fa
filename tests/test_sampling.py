"""Timestamp-grammar and suppression rule tests (OpenAI decode semantics the
reference never implements — it carries the metadata only)."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.config import get_config
from whisper_tpu.sampling import RuleState, apply_rules, build_suppress_ids

CFG = get_config("tiny")
V = CFG.n_vocab
TS0 = CFG.timestamp_begin


def _logits(n=1):
    return jnp.zeros((n, V), jnp.float32)


def _allowed(filtered):
    return np.asarray(filtered[0]) > -1e29


def test_suppress_ids_content():
    ids = set(build_suppress_ids(CFG).tolist())
    assert CFG.sot in ids and CFG.transcribe in ids and CFG.no_speech in ids
    assert CFG.lang_token_start in ids  # <|en|>
    assert CFG.eot not in ids
    assert CFG.blank_id not in ids  # blank only suppressed at first position


def test_no_timestamp_mode_blocks_all_timestamps():
    rs = RuleState.create(1)
    out = apply_rules(_logits(), rs, CFG, timestamps=False)
    ok = _allowed(out)
    assert not ok[TS0:].any()
    assert not ok[CFG.no_timestamps]
    # blank + eot suppressed at the first sampled position
    assert not ok[CFG.blank_id] and not ok[CFG.eot]
    # ordinary text fine
    assert ok[100]


def test_first_token_must_be_initial_timestamp():
    rs = RuleState.create(1)
    out = apply_rules(_logits(), rs, CFG, timestamps=True)
    ok = _allowed(out)
    assert not ok[:TS0].any()          # no text at position 0
    assert ok[TS0]                     # <|0.00|> allowed
    assert ok[TS0 + 50]                # cap inclusive (1.0s default)
    assert not ok[TS0 + 51:].any()     # beyond initial cap


def test_after_single_timestamp_text_required():
    rs = RuleState.create(1)
    rs = rs.advance(jnp.asarray([TS0 + 5]), TS0)  # opened with <|0.10|>
    out = apply_rules(_logits(), rs, CFG, timestamps=True)
    ok = _allowed(out)
    # [ts] with virtual-ts penultimate -> must be text now
    assert ok[:CFG.eot].any()
    assert not ok[TS0:].any()


def test_after_text_then_timestamp_pair_close():
    rs = RuleState.create(1)
    rs = rs.advance(jnp.asarray([TS0 + 5]), TS0)
    rs = rs.advance(jnp.asarray([123]), TS0)       # text
    rs = rs.advance(jnp.asarray([TS0 + 9]), TS0)   # closing stamp
    # peak eot so the timestamp-mass rule doesn't swallow it on flat logits
    out = apply_rules(_logits().at[:, CFG.eot].set(10.0), rs, CFG, timestamps=True)
    ok = _allowed(out)
    # last=ts, penult=text -> next must be ts (>= same stamp) or eot
    assert not ok[:CFG.eot].any()
    assert ok[CFG.eot]
    assert not ok[TS0: TS0 + 9].any()  # monotonicity: below max suppressed
    assert ok[TS0 + 9]                 # same stamp allowed mid-pair


def test_monotonic_strictly_after_closed_pair():
    rs = RuleState.create(1)
    rs = rs.advance(jnp.asarray([TS0 + 5]), TS0)
    rs = rs.advance(jnp.asarray([123]), TS0)
    # peak a text token so the timestamp-mass rule doesn't dominate the
    # (unrealistic) flat logits
    logits = _logits().at[:, 200].set(10.0)
    out = apply_rules(logits, rs, CFG, timestamps=True)
    ok = _allowed(out)
    # last=text: timestamps strictly above max allowed, text allowed
    assert ok[200]
    assert not ok[TS0 + 5]
    assert ok[TS0 + 6]


def test_timestamp_mass_forces_timestamp():
    rs = RuleState.create(1)
    rs = rs.advance(jnp.asarray([TS0]), TS0)
    rs = rs.advance(jnp.asarray([123]), TS0)
    # huge mass on the timestamp range
    logits = jnp.zeros((1, V), jnp.float32).at[:, TS0:].set(5.0)
    out = apply_rules(logits, rs, CFG, timestamps=True)
    ok = _allowed(out)
    assert not ok[:TS0].any()
    assert ok[TS0 + 1:].any()


def test_rules_are_per_stream():
    rs = RuleState.create(2)
    rs = rs.advance(jnp.asarray([TS0 + 5, 123]), TS0)
    out = apply_rules(_logits(2), rs, CFG, timestamps=True)
    a0 = np.asarray(out[0]) > -1e29
    a1 = np.asarray(out[1]) > -1e29
    assert not a0[TS0:].any()   # stream 0: after lone ts -> text only
    assert a1[TS0 + 1:].any()   # stream 1: after text -> timestamps open
