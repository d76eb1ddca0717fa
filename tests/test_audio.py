"""Audio IO tests: WAV parse round-trip, downmix, resample, raw PCM
(reference WAV path: cpp/src/AudioFile.h usage; PCM path:
cpp/src/WhisperHTTPServer.hpp:103-113)."""

import numpy as np
import pytest

from whisper_tpu.ops import audio as A


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(16000) * 0.3).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    A.write_wav(p, x, 16000)
    y = A.load_audio(p)
    assert y.shape == x.shape
    assert np.abs(y - x).max() < 2e-4  # 16-bit quantization


def test_parse_wav_formats(rng):
    # float32 WAV built by hand
    import struct

    x = (rng.standard_normal(1000) * 0.2).astype(np.float32)
    pcm = x.astype("<f4").tobytes()
    data = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    chans, rate = A.parse_wav(data)
    assert rate == 16000 and chans.shape == (1, 1000)
    np.testing.assert_allclose(chans[0], x, atol=1e-7)


def test_stereo_downmix(tmp_path, rng):
    import struct

    L = (rng.standard_normal(500) * 0.2).astype(np.float32)
    R = (rng.standard_normal(500) * 0.2).astype(np.float32)
    inter = np.stack([L, R], axis=1).reshape(-1)
    pcm = inter.astype("<f4").tobytes()
    data = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, 16000, 128000, 8, 32)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    y = A.load_audio(data)
    np.testing.assert_allclose(y, (L + R) / 2, atol=1e-6)


@pytest.mark.slow
def test_resample_tone():
    # 440 Hz tone at 44.1k -> 16k keeps frequency content
    sr0 = 44100
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = A.resample(x, sr0, 16000)
    assert abs(len(y) - 16000) <= 1
    spec = np.abs(np.fft.rfft(y[:16000] * np.hanning(len(y[:16000]))))
    peak_hz = np.argmax(spec) * 16000 / len(y[:16000])
    assert abs(peak_hz - 440) < 5
    # amplitude roughly preserved
    assert 0.7 < np.abs(y[200:-200]).max() < 1.3


def test_pcm_f32():
    x = np.array([0.1, -0.2, 0.3], np.float32)
    y = A.pcm_f32_from_bytes(x.tobytes())
    np.testing.assert_array_equal(x, y)
    with pytest.raises(A.WavFormatError):
        A.pcm_f32_from_bytes(b"abc")


def test_demo_wav_loads(demo_wav_path):
    y = A.load_audio(demo_wav_path)
    assert y.ndim == 1 and len(y) > 16000  # multi-second zh clip
    assert np.abs(y).max() <= 1.0
