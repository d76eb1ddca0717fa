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
from typing import List, Optional, Sequence, Tuple

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


def _fuzzy_overlap(a: str, b: str, max_probe: int = 48,
                   similarity: float = 0.72) -> int:
    """Chars to drop from the head of ``b`` that re-hear the tail of ``a``.

    Real decodes of overlapping audio rarely produce byte-identical text
    (VERDICT r3 #5), so exact suffix/prefix matching under-trims. This finds
    the longest common block between a's tail and b's head (difflib) and
    accepts it when it is substantial AND anchored at the junction — i.e.
    it ends near the end of ``a`` and starts near the start of ``b`` — so
    mid-string coincidences never cause over-trimming."""
    exact = _lcs_overlap(a, b, max_probe)
    import difflib

    limit = min(len(a), len(b), max_probe)
    # junction-anchored sweep: the duplicated region is a SUFFIX of a
    # re-heard as a PREFIX of b, so compare equal-length windows across
    # the junction directly, largest first, and trim at the first window
    # similar enough to be a re-hearing. (A single find_longest_match can
    # lose the junction-anchored block to an equally-long match elsewhere
    # in the probe window — caught by the merge property test.)
    for j in range(limit, max(3, exact), -1):
        r = difflib.SequenceMatcher(None, a[len(a) - j:], b[:j],
                                    autojunk=False).ratio()
        if r >= similarity:
            return j
    return exact


def merge_window_words(window_words: Sequence[Optional[Sequence[dict]]],
                       step_s: float, overlap_s: float) -> List[dict]:
    """Merge per-window word lists (window-LOCAL times) into one absolute,
    time-ordered list.

    Overlap policy (ADVICE r3): each overlap region is CUT at its midpoint
    on word START times — window j-1 owns words starting before the cut,
    window j owns words starting at/after it. A word straddling the cut is
    emitted exactly once (by whichever window heard its start on its own
    side; near-identical double-hearings within 0.3 s are deduped). When a
    window was silence-gated (no words), its half of the overlap falls back
    to the neighbour's hearing instead of losing the words entirely.
    """
    n = len(window_words)
    wins: List[List[dict]] = []
    for j in range(n):
        ws = window_words[j] or []
        wins.append(sorted(
            (dict(w, start=round(w["start"] + j * step_s, 3),
                  end=round(w["end"] + j * step_s, 3)) for w in ws),
            key=lambda w: (w["start"], w["end"])))
    cuts = [j * step_s + overlap_s / 2.0 for j in range(1, n)]

    def lo(j):
        return cuts[j - 1] if j > 0 else float("-inf")

    def hi(j):
        return cuts[j] if j < n - 1 else float("inf")

    out: List[dict] = []
    for j in range(n):
        for w in wins[j]:
            if lo(j) <= w["start"] < hi(j):
                out.append(w)
            elif w["start"] < lo(j) and not any(
                    x["start"] >= (j - 1) * step_s for x in wins[j - 1]):
                # window j-1 heard nothing in the shared overlap (silence-
                # gated or empty): keep window j's hearing of that region
                out.append(w)
            elif (w["start"] >= hi(j) and j + 1 < n
                    and not any(x["start"] < hi(j) + overlap_s / 2.0
                                for x in wins[j + 1])):
                out.append(w)
    out.sort(key=lambda w: (w["start"], w["end"]))
    deduped: List[dict] = []
    for w in out:
        if (deduped
                and w["word"].strip() == deduped[-1]["word"].strip()
                and abs(w["start"] - deduped[-1]["start"]) < 0.3):
            continue  # double-hearing of a cut-straddling word
        deduped.append(w)
    return deduped


def text_from_words(words: Sequence[dict], language: str) -> str:
    """Transcript implied by a merged word list — guarantees words/text
    agreement in long-form responses (ADVICE r3: the word list could
    disagree with the separately-deduped merge_texts output)."""
    text = "".join(w["word"] for w in words).strip()
    if language in ("zh", "ja", "th", "yue"):
        text = text.replace(" ", "")
    return text


def merge_transcripts(results: Sequence[dict], step_s: float,
                      overlap_s: float, language: str) -> dict:
    """Merge per-window result dicts ({text, words?}) into {text, words?}.

    With word timestamps present on every non-silent window, the overlap is
    reconciled at word level (merge_window_words) and the text is derived
    FROM the merged words, so they cannot disagree. Otherwise falls back to
    fuzzy text-overlap trimming (merge_texts).
    """
    have_words = [r.get("words") for r in results]
    if all(w is not None for w in have_words):
        words = merge_window_words(have_words, step_s, overlap_s)
        return {"text": text_from_words(words, language), "words": words}
    return {"text": merge_texts([r.get("text", "") for r in results],
                                language)}


def _next_pow2(n: int, cap: int = 64) -> int:
    p = 1
    while p < n and p < cap:
        p *= 2
    return p


# previous-text prompt-length buckets: each distinct prompt length is a
# separate compiled program, so quantize to a handful of sizes
_PREV_BUCKETS = (16, 64, 223)


def _bucket_prev(n: int) -> int:
    for b in _PREV_BUCKETS:
        if n <= b:
            return b
    return _PREV_BUCKETS[-1]


def silence_mask(result, no_speech_threshold, logprob_threshold) -> np.ndarray:
    """OpenAI no-speech gate (whisper/transcribe.py semantics): a segment is
    silent — its text dropped / its window skipped — when the no-speech
    probability exceeds ``no_speech_threshold``, UNLESS the decode was
    confident anyway (avg_logprob above ``logprob_threshold``). The reference
    has no equivalent: it always emits the argmax tokens, so silence
    hallucinates text with real weights."""
    nsp = np.asarray(result.no_speech_prob)
    if no_speech_threshold is None:
        return np.zeros(nsp.shape[0], bool)
    silent = nsp > no_speech_threshold
    if logprob_threshold is not None:
        confident = np.asarray(result.avg_logprob) > logprob_threshold
        silent &= ~confident
    return silent


def transcribe_seek(pipe, waves, language: str):
    """Timestamp-conditioned sliding-window long-form transcription.

    The OpenAI-canonical strategy: decode a 30 s window WITH timestamps,
    advance the window to the end of the last complete segment, repeat —
    batched across all still-live utterances each round (window batches are
    padded to powers of two to bound recompiles). Falls back to a full-window
    advance when a window yields no complete segment.

    When ``pipe.condition_on_previous_text`` is set, each window's prompt is
    ``[sot_prev, *prev_text_tokens, sot, lang, task]`` (OpenAI semantics: the
    accepted transcript so far, re-encoded and truncated to the last
    n_text_ctx//2 - 1 tokens). Per-stream lengths differ, so prompts are
    right-aligned with attention-masked left padding (decode.greedy_decode
    ``prompt_pad``), with the prev region bucketed to bound recompiles.

    Returns per-utterance (text, segments[(start_s, end_s, text)]).
    """
    import jax.numpy as jnp
    import numpy as np

    from .config import N_SAMPLES
    from .decode import extract_texts, greedy_decode
    from .ops.mel import log_mel_batch
    from .text import parse_segments, postprocess

    cfg = pipe.cfg
    n = len(waves)
    seeks = [0] * n
    done = [len(w) == 0 for w in waves]
    segments = [[] for _ in range(n)]
    texts = [[] for _ in range(n)]
    sot_seq = np.asarray(cfg.sot_sequence(language, pipe.task)[:-1], np.int32)  # drop no_ts
    suppress = (jnp.asarray(pipe._suppress_ids)
                if getattr(pipe, "_suppress_ids", None) is not None else None)
    condition = bool(getattr(pipe, "condition_on_previous_text", False))
    max_prev = cfg.n_text_ctx // 2 - 1  # OpenAI's prompt budget

    while not all(done):
        live = [i for i in range(n) if not done[i]]
        bucket = _next_pow2(len(live))
        batch = np.zeros((bucket, N_SAMPLES), np.float32)
        lengths = np.zeros((bucket,), np.int32)
        for j, i in enumerate(live):
            win = waves[i][seeks[i] : seeks[i] + N_SAMPLES]
            batch[j, : len(win)] = win
            lengths[j] = len(win)

        prev_tok = [[] for _ in live]
        initial = (getattr(pipe, "initial_prompt", None) or "").strip()
        if condition or initial:
            for j, i in enumerate(live):
                # OpenAI semantics: initial_prompt seeds the context history
                # and fades out as real transcript accumulates. With
                # condition off there is no sliding context, so the seed
                # applies to the FIRST window only (whisper/transcribe.py
                # seeds once; re-injecting it every window over-primes).
                seed = initial if (condition or not texts[i]) else ""
                parts = ([seed] if seed else []) + (texts[i] if condition else [])
                prev = " ".join(parts).strip()
                if prev:
                    prev_tok[j] = pipe.tokenizer.encode(" " + prev)[-max_prev:]
        if any(prev_tok):
            prev_w = _bucket_prev(max(len(t) for t in prev_tok))
            P = 1 + prev_w + len(sot_seq)  # [sot_prev, prev..., sot, lang, task]
            prompts = np.full((bucket, P), cfg.eot, np.int32)
            pads = np.full((bucket,), P - len(sot_seq), np.int32)
            prompts[:, -len(sot_seq):] = sot_seq
            for j, t in enumerate(prev_tok):
                if t:
                    pads[j] = prev_w - len(t)
                    prompts[j, pads[j]] = cfg.sot_prev
                    prompts[j, pads[j] + 1 : pads[j] + 1 + len(t)] = t
                # streams with no prev text keep pads pointing at sot: the
                # whole [sot_prev, prev] region is masked away
            prompt_pad = jnp.asarray(pads)
            sot_index = P - len(sot_seq)
        else:
            P = len(sot_seq)
            prompts = np.tile(sot_seq[None], (bucket, 1))
            prompt_pad, sot_index = None, 0
        mel = log_mel_batch(jnp.asarray(batch), jnp.asarray(lengths),
                            n_mels=cfg.n_mels)[..., : 2 * cfg.n_audio_ctx]
        if getattr(pipe, "beam_size", 0) and pipe.beam_size > 1:
            from .beam import beam_search

            res = beam_search(
                pipe.params, mel, jnp.asarray(prompts), cfg,
                beam_size=pipe.beam_size,
                compute_dtype=pipe.compute_dtype, suppress_ids=suppress,
                timestamps=True, apply_filters=True, kv_quant=pipe.kv_quant,
                self_kv_quant=getattr(pipe, "self_kv_quant", False),
                max_tokens=pipe.max_tokens,
                prompt_pad=prompt_pad, sot_index=sot_index,
            )
        else:
            res = greedy_decode(
                pipe.params, mel, jnp.asarray(prompts), cfg,
                compute_dtype=pipe.compute_dtype, suppress_ids=suppress,
                timestamps=True, apply_filters=True, kv_quant=pipe.kv_quant,
                self_kv_quant=getattr(pipe, "self_kv_quant", False),
                max_tokens=pipe.max_tokens,
                prompt_pad=prompt_pad, sot_index=sot_index,
            )
        win_texts = extract_texts(res, P, pipe.tokenizer, timestamps=True)
        silent = silence_mask(res, getattr(pipe, "no_speech_threshold", 0.6),
                              getattr(pipe, "logprob_threshold", -1.0))
        for j, i in enumerate(live):
            base_s = seeks[i] / 16000.0
            win_len = int(lengths[j])
            last_window = seeks[i] + win_len >= len(waves[i])
            if silent[j]:
                # OpenAI seek semantics: no-speech window -> emit nothing,
                # advance a full window (whisper/transcribe.py should_skip)
                seeks[i] += N_SAMPLES
                if last_window or seeks[i] >= len(waves[i]):
                    done[i] = True
                continue
            segs = parse_segments(win_texts[j])
            complete = [s for s in segs if s[1] is not None]
            if last_window or not complete:
                # keep everything; done (last window) or blind 30s advance
                for s0, s1, txt in segs:
                    segments[i].append((base_s + s0,
                                        base_s + s1 if s1 is not None else None,
                                        txt))
                texts[i].append(" ".join(t for _, _, t in segs) if segs else "")
                if last_window:
                    done[i] = True
                else:
                    seeks[i] += N_SAMPLES
            else:
                advance_s = max(complete[-1][1], 1.0)
                for s0, s1, txt in complete:
                    segments[i].append((base_s + s0, base_s + s1, txt))
                texts[i].append(" ".join(t for _, _, t in complete))
                seeks[i] += int(advance_s * 16000)
            if seeks[i] >= len(waves[i]):
                done[i] = True

    sep = "" if language in ("zh", "ja", "th", "yue") else " "
    out = []
    for i in range(n):
        text = postprocess(sep.join(t for t in texts[i] if t), language)
        out.append((text, segments[i]))
    return out


def merge_texts(texts: Sequence[str], language: str = "zh",
                trim_overlap: bool = True, max_probe: int = 48,
                similarity: float = 0.72) -> str:
    """Concatenate chunk transcripts; dedup text duplicated by audio overlap
    (fuzzy: near-duplicate junctions from non-identical overlap decodes are
    trimmed too, _fuzzy_overlap). ``max_probe``/``similarity`` expose the
    junction-sweep constants so weights day can sweep them on real
    overlapping decodes before they calcify (VERDICT r4 weak #5)."""
    sep = "" if language in ("zh", "ja", "th", "yue") else " "
    out = ""
    for t in texts:
        t = t.strip()
        if not t:
            continue
        if out and trim_overlap:
            ln = _fuzzy_overlap(out, t, max_probe=max_probe,
                                similarity=similarity)
            t = t[ln:].strip()
        if not t:
            continue
        out = out + sep + t if out else t
    return out
