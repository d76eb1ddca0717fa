"""Test config: run everything on the CPU backend with 8 virtual devices.

This is the "fake backend" layer the reference has no equivalent of
(SURVEY.md §4): numerical tests run on JAX CPU; sharding tests see an
8-device mesh via --xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon sitecustomize re-registers the TPU backend and rewrites
# jax_platforms to "axon,cpu"; force CPU after import too
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Tests spin up dozens of short-lived nano engines; the production-default
# start()-time warmup (compile every bucket's programs up front) would
# dominate suite wall-clock. Compile-on-demand still serializes through the
# engine's compile lock; dedicated warmup tests opt back in explicitly.
from whisper_tpu.serving.engine import ContinuousBatchingEngine as _CBE

_CBE.WARM_START_DEFAULT = False


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def demo_wav_path(tmp_path_factory):
    """A real on-disk WAV for IO tests: synthesized speech-band chirp.

    Self-contained — the suite must pass without the reference checkout
    (its demo.wav is only a convenience clip, not a golden fixture here).
    """
    import wave

    path = tmp_path_factory.mktemp("audio") / "demo.wav"
    sr = 16000
    t = np.arange(sr * 3) / sr
    # chirp 200->3000 Hz with an amplitude envelope, plus a quiet tail
    f = 200 + (3000 - 200) * t / t[-1]
    y = 0.5 * np.sin(2 * np.pi * f * t) * np.hanning(len(t))
    pcm = (np.clip(y, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return str(path)
