"""zh post-processing + WER normalization tests (reference: zhconv usage at
python/whisper.py:264-269; punctuation strip at test_wer.py:238-246)."""

from whisper_tpu.text import postprocess, remove_punctuation, t2s


def test_t2s_demo_transcript():
    # the reference's golden demo.wav transcript (README.md:171-180)
    assert t2s("甚至出現交易幾乎停止的情況") == "甚至出现交易几乎停止的情况"


def test_t2s_common():
    assert t2s("經濟問題") == "经济问题"
    assert t2s("這是繁體字測試") == "这是繁体字测试"
    assert t2s("already simplified 已经是简体") == "already simplified 已经是简体"


def test_remove_punctuation():
    assert remove_punctuation("你好, 世界！") == "你好世界"
    assert remove_punctuation("a b.c?d") == "abcd"
    assert remove_punctuation("（测试）《书名》…——") == "测试书名"


def test_postprocess_language_gate():
    assert postprocess(" 情況 ", "zh") == "情况"
    assert postprocess(" 情況 ", "en") == "情況"  # untouched for non-zh


def test_parse_segments():
    from whisper_tpu.text import parse_segments

    segs = parse_segments("<|0.00|> hello world<|2.40|><|2.40|> next bit<|5.00|>")
    assert segs == [(0.0, 2.4, "hello world"), (2.4, 5.0, "next bit")]
    # unterminated final segment keeps None end
    segs = parse_segments("<|1.00|>trailing")
    assert segs == [(1.0, None, "trailing")]
    assert parse_segments("no timestamps at all") == []
