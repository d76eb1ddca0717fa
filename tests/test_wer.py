"""WER harness tests (edit distance semantics match reference
test_wer.py:209-246)."""

import os

import pytest

from whisper_tpu.eval.wer import AIShellDataset, WerResult, edit_distance, score_pairs


def test_edit_distance():
    assert edit_distance("", "") == 0
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("abc", "") == 3
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("今天天气", "今天天汽") == 1
    assert edit_distance("abc", "acb") == 2


def test_score_pairs_punctuation_and_accumulation():
    res = score_pairs([
        ("a.wav", "今天天气不错。", "今天天气不错"),   # punct stripped -> 0 err
        ("b.wav", "你好世界", "你好地球"),             # 2 errors / 4 chars
    ])
    assert res.total_errors == 2
    assert res.total_chars == 10
    assert abs(res.wer - 0.2) < 1e-9
    assert res.per_utt[0][3] == 0.0
    assert abs(res.per_utt[1][3] - 0.5) < 1e-9


def test_aishell_dataset(tmp_path):
    gt = tmp_path / "ground_truth.txt"
    (tmp_path / "aishell_S0764").mkdir()
    gt.write_text("BAC009S0764W0121 甚至出现交易几乎停止的情况\n"
                  "BAC009S0764W0122 一二三\n")
    ds = AIShellDataset(str(gt))
    assert len(ds) == 2
    items = list(ds)
    assert items[0].transcript == "甚至出现交易几乎停止的情况"
    assert items[0].path.endswith("aishell_S0764/BAC009S0764W0121.wav")


def test_word_level_wer():
    res = score_pairs([
        ("a.wav", "the quick brown fox", "the quick brown box"),
        ("b.wav", "Hello, World!", "hello world"),
    ], level="word")
    # 1 substitution over 4 words + 0 over 2 words
    assert res.total_errors == 1
    assert res.total_chars == 6
    assert abs(res.per_utt[0][3] - 0.25) < 1e-9
    assert res.per_utt[1][3] == 0.0


@pytest.mark.slow
def test_eval_main_end_to_end(tmp_path, rng):
    """Drive ``python -m whisper_tpu.eval`` over a synthetic AIShell-format
    dataset to a wer.txt — the reference's only correctness gate is this
    invocation shape (python/test_wer.py:249-303). The WER value is
    meaningless with random weights; the plumbing (dataset iteration, batch
    pipeline, per-utterance logging, wer.txt output) is the test."""
    import numpy as np

    from whisper_tpu.eval.__main__ import main as eval_main
    from whisper_tpu.ops.audio import write_wav

    wav_dir = tmp_path / "aishell_S0764"
    wav_dir.mkdir()
    gt = tmp_path / "ground_truth.txt"
    lines = []
    for i in range(5):
        utt = f"BAC0000{i}"
        write_wav(str(wav_dir / f"{utt}.wav"),
                  (rng.standard_normal(8000) * 0.05).astype(np.float32))
        lines.append(f"{utt} 测试句子{i}")
    gt.write_text("\n".join(lines), encoding="utf-8")

    log = tmp_path / "test_wer.log"
    out = tmp_path / "wer.txt"
    rc = eval_main([
        "--dataset", "aishell", "--gt_path", str(gt),
        "--model_type", "tiny", "--language", "zh",
        "--batch", "4", "--dtype", "float32", "--limit", "5",
        "--log", str(log), "--out", str(out),
    ])
    assert rc == 0
    wer = float(out.read_text().strip())
    assert wer >= 0.0
    logged = log.read_text(encoding="utf-8")
    assert "WER" in logged and "BAC00000" in logged
