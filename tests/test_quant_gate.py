"""Quantization accuracy gate tests (whisper_tpu.eval.quant_gate).

The reference gates quantization with Pulsar2's EndToEnd precision analysis
(model_convert/config_whisper_encoder_u16.json:26-27); this harness is the
TPU stack's equivalent, runnable offline on proxy metrics (per-step logit KL
and top-1 agreement vs fp32).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.eval.quant_gate import GateResult, gate, run_gate
from whisper_tpu.models.model import init_params

NANO = WhisperConfig(
    name="nano-gate",
    n_mels=80,
    n_audio_ctx=64,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=24,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def setup(rng):
    params = init_params(NANO, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        (rng.standard_normal((2, NANO.n_mels, 2 * NANO.n_audio_ctx)) * 0.3
         ).astype(np.float32))
    return params, mel


@pytest.mark.slow
def test_fp32_control_measures_zero(setup):
    """The no-quantization control must show ~zero divergence — the harness
    itself adds no error."""
    params, mel = setup
    r = run_gate(params, NANO, mel, "fp32", max_tokens=8)
    assert r.steps > 0
    assert r.kl_mean < 1e-6
    assert r.top1_agreement == 1.0
    assert r.logit_max_abs_err < 1e-3


@pytest.mark.parametrize("variant",
                         ["int8_weights", "int8_cross_kv", "int8_self_kv",
                          "int8_all",
                          pytest.param("w8a8", marks=pytest.mark.slow)])
def test_quant_variants_produce_finite_metrics(setup, variant):
    params, mel = setup
    r = run_gate(params, NANO, mel, variant, max_tokens=8)
    assert r.steps > 0
    assert np.isfinite(r.kl_mean) and r.kl_mean >= 0.0
    assert 0.0 <= r.top1_agreement <= 1.0
    assert np.isfinite(r.logit_max_abs_err)
    # int8 quantization of a sane model cannot blow the distribution apart
    assert r.kl_mean < 1.0, f"{variant}: kl={r.kl_mean}"


@pytest.mark.slow
def test_gelu_tanh_variant_small_divergence(setup, monkeypatch):
    """The tanh-GELU approximation (flagship bench config) must register as a
    small, finite divergence — and must restore the erf default afterwards."""
    params, mel = setup
    monkeypatch.delenv("WHISPER_TPU_GELU", raising=False)
    r = run_gate(params, NANO, mel, "gelu_tanh", max_tokens=8)
    assert r.steps > 0
    assert np.isfinite(r.kl_mean) and 0.0 <= r.kl_mean < 0.5
    assert r.logit_max_abs_err > 0.0  # it IS a different function
    import os

    assert "WHISPER_TPU_GELU" not in os.environ


def test_gate_thresholds():
    good = GateResult("a", kl_mean=0.001, top1_agreement=0.999,
                      logit_max_abs_err=0.1, steps=100)
    bad_kl = GateResult("b", kl_mean=0.5, top1_agreement=0.999,
                        logit_max_abs_err=0.1, steps=100)
    bad_top1 = GateResult("c", kl_mean=0.001, top1_agreement=0.5,
                          logit_max_abs_err=0.1, steps=100)
    assert gate({"a": good})
    assert not gate({"a": good, "b": bad_kl})
    assert not gate({"a": good, "c": bad_top1})


@pytest.mark.slow
def test_cli_smoke(capsys):
    """CLI entry produces the one-line JSON verdict."""
    import json

    from whisper_tpu.eval import quant_gate as QG

    rc = QG.main(["--model", "test-nano", "--batch", "1", "--max_tokens", "4",
                  "--variants", "fp32", "--kl_threshold", "0.01"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert rc == 0 and d["pass"] is True
    assert "fp32" in d
    # provenance: random-init runs must self-declare the threshold caveat
    assert d["weights"] == "random-init"
    assert "caveat" in d
