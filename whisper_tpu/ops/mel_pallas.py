"""Pallas TPU kernel: fused log-mel frontend.

The jnp path (ops/mel.py) materializes the framed audio — (B, 3000, 400)
fp32 ≈ 4.6 MB per second of batch — in HBM between framing and the DFT
matmul. This kernel fuses framing + Hann/DFT matmul + power + mel projection
+ log10 in VMEM per frame-tile: HBM sees only raw audio in (1.9 MB/utt) and
log-mel out (0.9 MB/utt).

Per (batch, frame-tile) program:
  audio slice (FT*hop + n_fft samples) -> frames (FT, n_fft) via the same
  3-chunk reshape trick as ops/mel.py -> @ DFT bank (n_fft, 2F) -> |.|^2
  -> @ melᵀ (F, n_mels) -> log10 -> out tile (FT, n_mels).

The per-utterance max / -8 dB clamp / scale stays outside (elementwise over
the small output; XLA fuses it). Numerics match ops/mel.py._power_spectrum +
filterbank to fp32 tolerance (golden-tested in interpret mode and on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from ..config import HOP_LENGTH, N_FFT, N_FRAMES
from .mel import _dft_bank, mel_filterbank

FRAME_TILE = 256


def _mel_kernel(audio_ref, dft_ref, fb_ref, out_ref, *, hop: int, n_fft: int,
                tile: int):
    """audio_ref: (1, 1, C, hop) hop-chunked window at this tile's frame 0.

    Framing is fused into the DFT matmul: frame f = concat of hop-chunks
    [f, f+1, f+2] (truncated to n_fft), so with the DFT bank row-padded to
    k*hop, frames @ dft == Σ_i chunks[i:i+tile] @ dft[i*hop:(i+1)*hop] — a
    sum of small matmuls, no vector concat (Mosaic can't concat slices with
    mismatched sublane offsets).
    """
    chunks = audio_ref[0, 0]                                # (C, hop)
    k = -(-n_fft // hop)                                    # chunks per frame
    spec = None
    for i in range(k):
        part = jax.lax.dot_general(
            chunks[i : i + tile].astype(jnp.float32),
            dft_ref[i * hop : (i + 1) * hop],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,  # fp32 island: log10 follows
            preferred_element_type=jnp.float32)             # (tile, 2F)
        spec = part if spec is None else spec + part
    F = spec.shape[-1] // 2
    power = spec[:, :F] ** 2 + spec[:, F:] ** 2             # (tile, F)
    mel = jax.lax.dot_general(
        power, fb_ref[...],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                 # (tile, n_mels)
    out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * np.float32(1.0 / np.log(10.0))


@functools.partial(jax.jit, static_argnames=("n_mels", "n_fft", "hop",
                                             "n_frames", "interpret"))
def log10_mel_pallas(
    audio_padded: jnp.ndarray,  # (B, L) reflect-padded audio
    n_mels: int = 80,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    n_frames: int = N_FRAMES,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused raw log10-mel: returns (B, n_mels, n_frames), pre-normalization."""
    B, L = audio_padded.shape
    tile = min(FRAME_TILE, n_frames)
    n_tiles = -(-n_frames // tile)
    k = -(-n_fft // hop)
    # hop-chunks per tile window, padded to the TPU sublane multiple of 8
    C = (tile + k - 1 + 7) // 8 * 8
    slice_len = C * hop
    need = (n_tiles - 1) * tile * hop + slice_len
    if L < need:
        audio_padded = jnp.pad(audio_padded, ((0, 0), (0, need - L)))

    # DFT bank row-padded to k*hop so chunk i can matmul rows [i*hop,(i+1)*hop)
    dft = np.asarray(_dft_bank(n_fft))
    dft = jnp.asarray(np.pad(dft, ((0, k * hop - n_fft), (0, 0))))  # (k*hop, 2F)
    fb_t = jnp.asarray(mel_filterbank(n_mels, n_fft)).T     # (F, n_mels)

    # overlapping tile windows, hop-chunked so blocks are alignment-clean
    # (duplication = (k-1)*hop of tile*hop samples per tile, <1%)
    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(audio_padded, t * tile * hop, slice_len, axis=1)
         for t in range(n_tiles)], axis=1)                  # (B, n_tiles, slice_len)
    windows = windows.reshape(B, n_tiles, C, hop)

    kernel = functools.partial(_mel_kernel, hop=hop, n_fft=n_fft, tile=tile)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, C, hop), lambda b, t: (b, t, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((k * hop, dft.shape[1]), lambda b, t: (0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((fb_t.shape[0], n_mels), lambda b, t: (0, 0),
                         memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, n_mels), lambda b, t: (b, t, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile, n_mels), jnp.float32),
        interpret=interpret,
    )(windows, dft, fb_t)
    return out[:, :n_frames, :].transpose(0, 2, 1)
