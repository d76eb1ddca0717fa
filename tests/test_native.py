"""Native (C++) runtime tests: golden parity with the numpy implementations
plus the C ABI round trip through the real HTTP server.

Builds cpp/ on demand (skipped if no toolchain); parity failures here mean
the native and Python IO paths diverged.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "cpp")
LIB = os.path.join(CPP_DIR, "build", "libwhisper_tpu.so")


@pytest.fixture(scope="module")
def native_lib():
    if not os.path.exists(LIB):
        if shutil.which("cmake") is None:
            pytest.skip("no cmake toolchain")
        subprocess.run(["bash", os.path.join(CPP_DIR, "build.sh")], check=True,
                       capture_output=True, timeout=300)
    from whisper_tpu.utils.native import load_native

    lib = load_native()
    if lib is None:
        pytest.skip("native lib failed to load")
    return lib


def _wav_bytes(x: np.ndarray, rate: int, channels: int = 1, fmt: int = 3,
               bits: int = 32) -> bytes:
    if fmt == 3:
        pcm = x.astype("<f4").tobytes()
    else:
        pcm = np.clip(x * 32767, -32768, 32767).astype("<i2").tobytes()
        bits = 16
    ba = channels * bits // 8
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, fmt, channels, rate, rate * ba, ba, bits)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def test_native_wav_parity(native_lib, rng):
    from whisper_tpu.ops.audio import parse_wav, to_mono
    from whisper_tpu.utils.native import load_wav_native

    x = (rng.standard_normal(4000) * 0.3).astype(np.float32)
    data = _wav_bytes(x, 16000)
    native, rate = load_wav_native(data, 16000)
    ref = to_mono(parse_wav(data)[0])
    assert rate == 16000
    np.testing.assert_allclose(native, ref, atol=1e-7)


def test_native_wav_pcm16_stereo(native_lib, rng):
    from whisper_tpu.utils.native import load_wav_native

    L = np.clip(rng.standard_normal(1000) * 0.3, -0.99, 0.99).astype(np.float32)
    R = np.clip(rng.standard_normal(1000) * 0.3, -0.99, 0.99).astype(np.float32)
    inter = np.stack([L, R], axis=1).reshape(-1)
    data = _wav_bytes(inter, 16000, channels=2, fmt=1)
    native, _ = load_wav_native(data, 16000)
    np.testing.assert_allclose(native, (L + R) / 2, atol=2e-4)


@pytest.mark.slow
def test_native_resample_parity(native_lib):
    """Native windowed-sinc resampler matches the numpy one on a tone."""
    from whisper_tpu.ops.audio import resample
    from whisper_tpu.utils.native import load_wav_native

    sr0 = 44100
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    data = _wav_bytes(x, sr0)
    native, rate = load_wav_native(data, 16000)
    ref = resample(x, sr0, 16000)
    assert rate == 16000
    assert len(native) == len(ref)
    # interior samples agree closely (edges differ by conv boundary handling)
    np.testing.assert_allclose(native[500:-500], ref[500:-500], atol=5e-3)


def test_native_edit_distance(native_lib):
    from whisper_tpu.utils.native import edit_distance_native

    assert edit_distance_native("kitten", "sitting") == 3
    assert edit_distance_native("", "abc") == 3
    assert edit_distance_native("今天天气", "今天天汽") == 1
    assert edit_distance_native("甚至出现", "甚至出现") == 0


def test_native_wav_error(native_lib):
    from whisper_tpu.utils.native import load_wav_native

    with pytest.raises(ValueError, match="RIFF"):
        load_wav_native(b"garbage bytes here", 16000)


def test_native_demo_wav(native_lib, demo_wav_path):
    from whisper_tpu.ops.audio import load_audio
    from whisper_tpu.utils.native import load_wav_native

    data = open(demo_wav_path, "rb").read()
    native, rate = load_wav_native(data, 16000)
    assert rate == 16000
    ref = load_audio(demo_wav_path)  # may itself use native; compare length/scale
    assert len(native) == len(ref)
    np.testing.assert_allclose(native, ref, atol=1e-5)
