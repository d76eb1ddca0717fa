"""Long-audio transcription: chunked sliding-window over the 30 s model.

The reference simply truncates audio past 30 s (python/whisper.py:148-152) —
there is no long-form path anywhere in it (SURVEY.md §5). Whisper's
architecture is fixed at a 30 s window, so the serving-level answer is
chunking:

- ``fixed`` strategy: split into 30 s windows (with a short overlap whose
  duplicated text is trimmed at merge), transcribe ALL windows as ONE batch
  — the TPU-idiomatic shape: one encoder/decode program over the chunk
  batch instead of a host loop per window.

Chunks from multiple utterances can be flattened into one batch by the
caller; this module handles the per-utterance split/merge bookkeeping.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from .config import N_SAMPLES


@dataclass
class ChunkSpec:
    start: int  # sample offset into the utterance
    length: int


def plan_chunks(n_samples: int, chunk_samples: int = N_SAMPLES,
                overlap_samples: int = 0) -> List[ChunkSpec]:
    """Split an utterance into fixed windows (last one may be short)."""
    if n_samples <= chunk_samples:
        return [ChunkSpec(0, n_samples)]
    step = chunk_samples - overlap_samples
    assert step > 0, "overlap must be smaller than the chunk"
    out = []
    pos = 0
    while pos < n_samples:
        ln = min(chunk_samples, n_samples - pos)
        out.append(ChunkSpec(pos, ln))
        if pos + ln >= n_samples:
            break
        pos += step
    return out


def split_audio(audio: np.ndarray, chunk_samples: int = N_SAMPLES,
                overlap_samples: int = 0) -> Tuple[List[np.ndarray], List[ChunkSpec]]:
    specs = plan_chunks(len(audio), chunk_samples, overlap_samples)
    return [audio[s.start : s.start + s.length] for s in specs], specs


def _lcs_overlap(a: str, b: str, max_probe: int = 40) -> int:
    """Length of the longest suffix of `a` that prefixes `b` (merge trim)."""
    limit = min(len(a), len(b), max_probe)
    for ln in range(limit, 0, -1):
        if a[-ln:] == b[:ln]:
            return ln
    return 0


def merge_texts(texts: Sequence[str], language: str = "zh",
                trim_overlap: bool = True) -> str:
    """Concatenate chunk transcripts; dedup text duplicated by audio overlap."""
    sep = "" if language in ("zh", "ja", "th", "yue") else " "
    out = ""
    for t in texts:
        t = t.strip()
        if not t:
            continue
        if out and trim_overlap:
            ln = _lcs_overlap(out, t)
            t = t[ln:].strip()
        if not t:
            continue
        out = out + sep + t if out else t
    return out
