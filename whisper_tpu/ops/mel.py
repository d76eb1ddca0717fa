"""Log-mel spectrogram frontend, TPU-native.

Replaces the reference's host-CPU mel pipelines (python librosa at
python/whisper.py:131-166; C++ Eigen librosa.h at cpp/src/librosa/librosa.h)
with a jittable jnp implementation whose STFT is expressed as a strided
convolution against cos/sin DFT banks — i.e. pure MXU work, batched on device.

Numerics match librosa/OpenAI-Whisper: Hann (periodic) window, center reflect
padding, power-2 spectrum, slaney-normalized mel filterbank (htk=False,
fmin=0, fmax=sr/2), then log10 -> clamp at per-utterance max-8 dB -> (x+4)/4
(python/whisper.py:144-146, cpp/src/Whisper.cpp:157-174).

Padding policy:
- "feature_zero" (reference default): features computed on the true-length
  audio, padded/truncated to 3000 frames with literal zeros; on truncation
  the last 50 frames are zeroed (python/whisper.py:148-164).
- "audio_zero" (OpenAI-canonical): audio zero-padded to 30 s first.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HOP_LENGTH, N_FFT, N_FRAMES, N_SAMPLES, SAMPLE_RATE

ZERO_TAIL_FRAMES = 50  # frames zeroed on truncation (python/whisper.py:150-152)


# ---------------------------------------------------------------- filterbank
def hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep, mels)


def mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = 80,
    n_fft: int = N_FFT,
    sr: int = SAMPLE_RATE,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2+1).

    Matches librosa.filters.mel(norm='slaney', htk=False); the C++ reference
    builds the same bank at cpp/src/librosa/librosa.h:102-144.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(np.array(fmin)), hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _dft_bank(n_fft: int = N_FFT) -> np.ndarray:
    """Hann-windowed cos/sin DFT bank, shape (n_fft, 2*(n_fft//2+1)).

    Expressing the STFT as frames @ bank turns the frontend into a single
    MXU matmul instead of an FFT (the reference uses Eigen FFT on host CPU,
    cpp/src/librosa/librosa.h:79-96).
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)
    # periodic Hann (torch.hann_window / scipy fftbins=True)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    k = np.arange(n_freqs)[:, None]
    ang = 2.0 * np.pi * k * n[None, :] / n_fft
    cos_b = np.cos(ang) * window[None, :]
    sin_b = -np.sin(ang) * window[None, :]
    return np.concatenate([cos_b, sin_b], axis=0).astype(np.float32).T


def _frame(audio_padded: jnp.ndarray, n_frames: int, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, L) -> (B, n_frames, n_fft) overlapping frames via reshape/slice.

    n_fft=400 spans ceil(400/160)=3 hop-chunks, so frame f is the concat of
    chunks [f, f+1, f+2] truncated to n_fft — pure static slices, no gather,
    no conv; compiles instantly and vectorizes on any backend.
    """
    B, L = audio_padded.shape
    k = -(-n_fft // hop)  # chunks spanned by one frame
    need = (n_frames + k - 1) * hop
    if L < need:
        audio_padded = jnp.pad(audio_padded, ((0, 0), (0, need - L)))
    chunks = audio_padded[:, : (n_frames + k - 1) * hop].reshape(B, n_frames + k - 1, hop)
    parts = [chunks[:, i : i + n_frames] for i in range(k)]
    return jnp.concatenate(parts, axis=-1)[:, :, :n_fft]


def _power_spectrum(audio_padded: jnp.ndarray, n_fft: int, hop: int,
                    n_frames: Optional[int] = None) -> jnp.ndarray:
    """(B, L) center-padded audio -> (B, n_fft//2+1, T) power spectrum."""
    if n_frames is None:
        n_frames = 1 + (audio_padded.shape[1] - n_fft) // hop
    frames = _frame(audio_padded, n_frames, n_fft, hop)
    bank = jnp.asarray(_dft_bank(n_fft))
    # fp32 island: the log-mel that follows is precision-sensitive
    out = jnp.einsum("btn,nf->btf", frames, bank,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    n_freqs = n_fft // 2 + 1
    re, im = out[..., :n_freqs], out[..., n_freqs:]
    return (re * re + im * im).transpose(0, 2, 1)


def _normalize(log_mel_input: jnp.ndarray, per_utt_max: jnp.ndarray) -> jnp.ndarray:
    clamped = jnp.maximum(log_mel_input, per_utt_max[:, None, None] - 8.0)
    return (clamped + 4.0) / 4.0


def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = 80,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    pad_to: Optional[int] = N_FRAMES,
    padding: str = "feature_zero",
) -> jnp.ndarray:
    """Exact-length log-mel. audio: (n,) or (B, n) float32 -> (B, n_mels, T).

    Jittable; a new trace per input length (use :func:`log_mel_batch` for the
    fixed-shape serving path).
    """
    if audio.ndim == 1:
        audio = audio[None]
    if padding == "audio_zero" and pad_to is not None:
        need = pad_to * hop
        audio = jnp.pad(audio, ((0, 0), (0, max(0, need - audio.shape[1]))))[:, :need]
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    power = _power_spectrum(x, n_fft, hop)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft))
    # fp32 island too: TPU default matmul precision is bf16 — a bf16 mel
    # contraction costs ~7.6e-4 abs in the normalized log-mel (measured),
    # an order of magnitude over the fp32 round-off budget
    mel = jnp.einsum("mf,bft->bmt", fb, power,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    feats = _normalize(log_spec, jnp.max(log_spec, axis=(1, 2)))
    if pad_to is not None:
        T = feats.shape[-1]
        if T > pad_to:
            feats = feats[..., :pad_to]
            if padding == "feature_zero":
                feats = feats.at[..., pad_to - ZERO_TAIL_FRAMES :].set(0.0)
        elif T < pad_to:
            feats = jnp.pad(feats, ((0, 0), (0, 0), (0, pad_to - T)))
    return feats


@functools.partial(jax.jit, static_argnames=("n_mels", "n_fft", "hop"))
def log_mel_batch(
    audio: jnp.ndarray,
    lengths: jnp.ndarray,
    n_mels: int = 80,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
) -> jnp.ndarray:
    """Fixed-shape batched log-mel for serving.

    audio: (B, N_SAMPLES) zero-padded float32; lengths: (B,) int32 true sample
    counts (<= N_SAMPLES). Returns (B, n_mels, 3000) with reference padding
    semantics: per-utterance masked max for the -8 dB clamp, zero features
    beyond the valid frames, last 50 frames zeroed for full-length audio.

    Deviation from the exact-length path: the reflect pad at the end of the
    true audio sees the zero padding (affects <=2 boundary frames), since the
    batch is padded before the device sees it.
    """
    B = audio.shape[0]
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    power = _power_spectrum(x, n_fft, hop, n_frames=N_FRAMES)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft))
    # fp32 island (see log_mel_spectrogram): pin the mel contraction to fp32
    mel = jnp.einsum("mf,bft->bmt", fb, power,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))

    n_valid = jnp.minimum(lengths // hop + 1, N_FRAMES)
    n_valid = jnp.where(lengths >= N_SAMPLES, N_FRAMES - ZERO_TAIL_FRAMES, n_valid)
    frame_idx = jnp.arange(N_FRAMES)[None, :]
    valid = frame_idx < n_valid[:, None]  # (B, T)

    masked = jnp.where(valid[:, None, :], log_spec, -jnp.inf)
    per_max = jnp.max(masked, axis=(1, 2))
    feats = _normalize(log_spec, per_max)
    return jnp.where(valid[:, None, :], feats, 0.0)
