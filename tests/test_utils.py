"""Profiling + logging utility tests (SURVEY.md §5 aux subsystems)."""

import json
import time

from whisper_tpu.utils.logging import get_logger
from whisper_tpu.utils.profiling import StageTimer


def test_stage_timer_report():
    t = StageTimer()
    with t.stage("mel"):
        time.sleep(0.01)
    with t.stage("decode"):
        time.sleep(0.02)
    with t.stage("decode"):
        time.sleep(0.005)
    t.add_audio(10.0)
    rep = t.report()
    assert rep["stages"]["decode"]["calls"] == 2
    assert rep["stages"]["mel"]["calls"] == 1
    assert rep["audio_seconds"] == 10.0
    assert rep["rtf"] > 0
    assert abs(sum(s["share"] for s in rep["stages"].values()) - 1.0) < 0.01
    json.loads(t.dump())  # serializable


def test_get_logger_idempotent():
    a = get_logger("whisper_tpu.test")
    b = get_logger("whisper_tpu.test")
    assert a is b
    assert len(a.handlers) == 1
    a.info("hello")
