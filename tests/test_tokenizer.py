"""Tokenizer tests: special-token layout, config-derived ids, round trips.

Validates against the known public multilingual Whisper vocab layout the
reference relies on (python/whisper_tokenizer.py:330-363).
"""

import numpy as np
import pytest

from whisper_tpu.config import get_config
from whisper_tpu.tokenizer import LANGUAGES, get_tokenizer, find_vocab_file


@pytest.fixture(scope="module")
def tok():
    try:
        find_vocab_file()
    except FileNotFoundError:
        pytest.skip("vocab asset not available")
    return get_tokenizer(True, num_languages=99, language="zh", task="transcribe")


def test_special_token_ids(tok):
    # canonical multilingual ids
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.to_language_token("en") == 50259
    assert tok.to_language_token("zh") == 50260
    assert tok.translate == 50358
    assert tok.transcribe == 50359
    assert tok.sot_lm == 50360
    assert tok.sot_prev == 50361
    assert tok.no_speech == 50362
    assert tok.no_timestamps == 50363
    assert tok.timestamp_begin == 50364


def test_config_matches_tokenizer(tok):
    cfg = get_config("tiny")
    assert cfg.eot == tok.eot
    assert cfg.sot == tok.sot
    assert cfg.transcribe == tok.transcribe
    assert cfg.translate == tok.translate
    assert cfg.no_timestamps == tok.no_timestamps
    assert cfg.no_speech == tok.no_speech
    assert cfg.timestamp_begin == tok.timestamp_begin
    assert cfg.lang_token_start == tok.to_language_token("en")
    # sot sequence [sot, lang, task, no_ts] (python/whisper.py:112-114)
    assert cfg.sot_sequence("zh", "transcribe") == (50258, 50260, 50359, 50363)
    assert tok.sot_sequence_including_notimestamps == (50258, 50260, 50359, 50363)


def test_turbo_layout_shifts_by_one():
    try:
        find_vocab_file()
    except FileNotFoundError:
        pytest.skip("vocab asset not available")
    cfg = get_config("turbo")
    tok100 = get_tokenizer(True, num_languages=100, language="yue", task="transcribe")
    assert cfg.n_vocab == 51866
    assert cfg.eot == 50257
    assert tok100.to_language_token("yue") == 50358
    assert cfg.transcribe == tok100.transcribe == 50360
    assert cfg.no_timestamps == tok100.no_timestamps == 50364


def test_roundtrip(tok):
    for text in ["Hello, world!", "今天天气不错", "甚至出现交易几乎停止的情况"]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_decode_skips_specials_and_timestamps(tok):
    ids = tok.encode("hello")
    full = [tok.sot] + ids + [tok.timestamp_begin + 10, tok.eot]
    # decode() drops everything >= timestamp_begin; sot/eot are < timestamp_begin
    # but >= eot so strip them like the reference does before decode
    text_ids = [i for i in full if i < tok.eot]
    assert tok.decode(text_ids) == "hello"
    ts = tok.decode_with_timestamps([tok.timestamp_begin + 100] + ids)
    assert ts.startswith("<|2.00|>")


def test_language_table():
    assert len(LANGUAGES) == 100
    assert list(LANGUAGES)[:4] == ["en", "zh", "de", "es"]
    assert list(LANGUAGES)[-1] == "yue"


def test_split_words_zh(tok):
    ids = tok.encode("今天天气")
    words, word_tokens = tok.split_to_word_tokens(ids)
    assert "".join(words) == "今天天气"
    assert sum(len(w) for w in word_tokens) == len(ids)


def test_en_preset_layout():
    """English-only .en models: GPT-2 vocab base, no language tokens."""
    cfg = get_config("tiny.en")
    assert cfg.n_vocab == 51864
    assert not cfg.is_multilingual
    assert cfg.eot == 50256
    assert cfg.sot == 50257
    assert cfg.lang_token_start == 50258   # layout keeps the 99 lang slots
    assert cfg.translate == 50357
    assert cfg.transcribe == 50358
    assert cfg.no_timestamps == 50362
    assert cfg.timestamp_begin == 50363


def test_en_sot_sequence_and_config_json_roundtrip():
    cfg = get_config("tiny.en")
    assert cfg.sot_sequence("en", "transcribe") == (cfg.sot, cfg.no_timestamps)
    # json round-trip preserves architecture fields
    from whisper_tpu.config import WhisperConfig

    cfg2 = WhisperConfig.from_json(cfg.to_json())
    assert cfg2.n_vocab == cfg.n_vocab
    assert cfg2.is_multilingual == cfg.is_multilingual
    assert cfg2.sot_sequence("en", "transcribe") == cfg.sot_sequence("en", "transcribe")


def test_en_vocab_missing_raises_precise_remediation(monkeypatch):
    """.en tokenization needs gpt2.tiktoken, which cannot be vendored without
    egress — the failure must say exactly how to remediate (VERDICT r2 #9),
    and must not be confused with a broken multilingual install."""
    import pytest

    from whisper_tpu.tokenizer import find_vocab_file, get_tokenizer

    monkeypatch.delenv("WHISPER_TPU_VOCAB", raising=False)
    with pytest.raises(FileNotFoundError) as ei:
        find_vocab_file(multilingual=False)
    msg = str(ei.value)
    assert "gpt2.tiktoken" in msg
    assert "fetch_assets.py" in msg          # the remediation
    assert "supported" in msg                 # supported-but-not-fetched
    with pytest.raises(FileNotFoundError, match="gpt2"):
        get_tokenizer(multilingual=False)
    # the vendored multilingual path still resolves
    assert find_vocab_file(multilingual=True).endswith("multilingual.tiktoken")


def test_reference_model_matrix_presets():
    """Every size the reference toolchain exports (export_onnx.py:36-56)
    resolves to a preset with the public architecture dims."""
    from whisper_tpu.config import get_config

    matrix = {
        # name: (n_mels, d, enc_layers, dec_layers, vocab, multilingual)
        "tiny": (80, 384, 4, 4, 51865, True),
        "tiny.en": (80, 384, 4, 4, 51864, False),
        "base": (80, 512, 6, 6, 51865, True),
        "base.en": (80, 512, 6, 6, 51864, False),
        "small": (80, 768, 12, 12, 51865, True),
        "small.en": (80, 768, 12, 12, 51864, False),
        "medium": (80, 1024, 24, 24, 51865, True),
        "medium.en": (80, 1024, 24, 24, 51864, False),
        "medium-aishell": (80, 1024, 24, 24, 51865, True),
        "large-v1": (80, 1280, 32, 32, 51865, True),
        "large-v2": (80, 1280, 32, 32, 51865, True),
        "large-v3": (128, 1280, 32, 32, 51866, True),
        "large": (128, 1280, 32, 32, 51866, True),
        "turbo": (128, 1280, 32, 4, 51866, True),
        "large-v3-turbo": (128, 1280, 32, 4, 51866, True),
        "distil-small.en": (80, 768, 12, 4, 51864, False),
        "distil-medium.en": (80, 1024, 24, 2, 51864, False),
        "distil-large-v2": (80, 1280, 32, 2, 51865, True),
        "distil-large-v3": (128, 1280, 32, 2, 51866, True),
        "distil-large-v3.5": (128, 1280, 32, 2, 51866, True),
    }
    for name, (mels, d, el, dl, vocab, multi) in matrix.items():
        cfg = get_config(name)
        assert cfg.n_mels == mels, name
        assert cfg.n_audio_state == cfg.n_text_state == d, name
        assert cfg.n_audio_layer == el and cfg.n_text_layer == dl, name
        assert cfg.n_vocab == vocab, name
        assert cfg.is_multilingual == multi, name
        assert cfg.head_dim_text == 64, name  # every Whisper size
