"""WER evaluation harness: datasets, edit distance, batched eval loop.

Counterpart of the reference's python/test_wer.py: AIShell ("<utt> <gt>"
lines) and CommonVoice (TSV) dataset iterators, char-level edit distance
after punctuation stripping, per-utterance and total WER with the same
accumulation (errors/chars), plus what the reference lacks: batched
inference across the dataset.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

from ..text import remove_punctuation, remove_punctuation_keep_spaces

logger = logging.getLogger("whisper_tpu.wer")


@dataclass
class Utterance:
    path: str
    transcript: str


class AIShellDataset:
    """Ground-truth file of "<utt_id> <transcript>" lines; wavs live next to
    it (reference python/test_wer.py:45-93 with wavs in aishell_S0764/)."""

    def __init__(self, gt_path: str, wav_dir: Optional[str] = None):
        self.items: List[Utterance] = []
        base = wav_dir or os.path.join(os.path.dirname(gt_path), "aishell_S0764")
        with open(gt_path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split(maxsplit=1)
                if len(parts) != 2:
                    continue
                utt, gt = parts
                wav = utt if utt.endswith(".wav") else utt + ".wav"
                self.items.append(Utterance(os.path.join(base, wav), gt))

    def __len__(self):
        return len(self.items)

    def __iter__(self) -> Iterator[Utterance]:
        return iter(self.items)


class CommonVoiceDataset:
    """CommonVoice TSV (path/sentence columns; reference test_wer.py:96-149)."""

    def __init__(self, tsv_path: str, clips_dir: Optional[str] = None):
        self.items: List[Utterance] = []
        base = clips_dir or os.path.join(os.path.dirname(tsv_path), "clips")
        with open(tsv_path, "r", encoding="utf-8") as f:
            header = f.readline().rstrip("\n").split("\t")
            try:
                pi, si = header.index("path"), header.index("sentence")
            except ValueError:
                raise ValueError(f"TSV missing path/sentence columns: {header}")
            for line in f:
                cols = line.rstrip("\n").split("\t")
                if len(cols) <= max(pi, si):
                    continue
                self.items.append(Utterance(os.path.join(base, cols[pi]), cols[si]))

    def __len__(self):
        return len(self.items)

    def __iter__(self) -> Iterator[Utterance]:
        return iter(self.items)


def _word_edit_distance(ref_words, hyp_words) -> int:
    """Levenshtein over word sequences (English-style WER; the reference is
    char-level only, right for zh)."""
    if len(ref_words) < len(hyp_words):
        ref_words, hyp_words = hyp_words, ref_words
    if not hyp_words:
        return len(ref_words)
    prev = list(range(len(hyp_words) + 1))
    for i, rw in enumerate(ref_words, 1):
        cur = [i] + [0] * len(hyp_words)
        for j, hw in enumerate(hyp_words, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (rw != hw))
        prev = cur
    return prev[-1]


def edit_distance(ref: str, hyp: str) -> int:
    """Levenshtein distance over characters (reference min_distance,
    test_wer.py:209-235) with an O(min(m,n)) rolling row. Uses the native
    C++ kernel when cpp/ is built."""
    try:
        from ..utils.native import edit_distance_native, load_native

        if load_native() is not None:
            return edit_distance_native(ref, hyp)
    except Exception:
        pass
    if len(ref) < len(hyp):
        ref, hyp = hyp, ref
    if not hyp:
        return len(ref)
    prev = list(range(len(hyp) + 1))
    for i, rc in enumerate(ref, 1):
        cur = [i] + [0] * len(hyp)
        for j, hc in enumerate(hyp, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (rc != hc))
        prev = cur
    return prev[-1]


@dataclass
class WerResult:
    total_errors: int
    total_chars: int
    per_utt: List[Tuple[str, str, str, float]]  # (path, gt, hyp, wer)

    @property
    def wer(self) -> float:
        return self.total_errors / max(self.total_chars, 1)


def score_pairs(pairs: Sequence[Tuple[str, str, str]],
                level: str = "char") -> WerResult:
    """pairs: (path, ground_truth, hypothesis). ``level='char'`` matches the
    reference's zh metric (sum(errors)/sum(chars), test_wer.py:276-302);
    ``level='word'`` is standard whitespace-token WER for spaced languages."""
    total_err = 0
    total_units = 0
    per_utt = []
    for path, gt, hyp in pairs:
        if level == "word":
            gt_u = remove_punctuation_keep_spaces(gt).split()
            hyp_u = remove_punctuation_keep_spaces(hyp).split()
            err = _word_edit_distance(gt_u, hyp_u)
            n = len(gt_u)
        else:
            gt_n = remove_punctuation(gt)
            hyp_n = remove_punctuation(hyp)
            err = edit_distance(gt_n, hyp_n)
            n = len(gt_n)
        total_err += err
        total_units += n
        per_utt.append((path, gt, hyp, err / max(n, 1)))
    return WerResult(total_err, total_units, per_utt)


def evaluate(
    pipeline,
    dataset,
    batch_size: int = 8,
    language: str = "zh",
    limit: Optional[int] = None,
    log_path: Optional[str] = None,
    level: str = "char",
) -> WerResult:
    """Batched WER eval (the reference runs strictly one-by-one,
    test_wer.py:276-297)."""
    items = list(dataset)[:limit]
    pairs: List[Tuple[str, str, str]] = []
    handlers: List[logging.Handler] = []
    prev_level = logger.level
    if log_path:
        h = logging.FileHandler(log_path)
        logger.addHandler(h)
        handlers.append(h)
        # the file log must capture per-utterance lines regardless of the
        # ambient root level (reference sets its logging up explicitly too,
        # python/test_wer.py:8-42)
        logger.setLevel(logging.INFO)
    try:
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            results = pipeline.transcribe_batch([u.path for u in chunk], language=language)
            for u, r in zip(chunk, results):
                pairs.append((u.path, u.transcript, r.text))
                part = score_pairs(pairs[-1:], level=level)
                logger.info(
                    "(%d/%d) %s gt: %s predict: %s WER: %.2f%%",
                    len(pairs), len(items), os.path.basename(u.path),
                    u.transcript, r.text, 100 * part.wer,
                )
        res = score_pairs(pairs, level=level)
        logger.info("Total WER: %.4f (%d/%d chars)", res.wer, res.total_errors, res.total_chars)
        return res
    finally:
        for h in handlers:
            logger.removeHandler(h)
            h.close()
        if log_path:
            logger.setLevel(prev_level)
