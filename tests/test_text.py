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


def test_t2s_phrase_level_disambiguation():
    """Phrase-level t2s (the role of OpenCC's TSPhrases in the reference):
    ambiguous chars take the word-correct form, not the char default."""
    from whisper_tpu.text import t2s

    # defaults for ambiguous chars
    assert t2s("乾燥") == "干燥"
    assert t2s("看著他") == "看着他"
    assert t2s("瞭解情況") == "了解情况"
    assert t2s("藉口") == "借口"
    assert t2s("頭髮") == "头发"
    assert t2s("鍾情") == "钟情"
    assert t2s("餅乾") == "饼干"
    # phrase exceptions override the defaults
    assert t2s("乾隆皇帝") == "乾隆皇帝"
    assert t2s("著名作家") == "著名作家"
    assert t2s("顯著") == "显著"
    assert t2s("瞭望塔") == "瞭望塔"
    assert t2s("聲名狼藉") == "声名狼藉"
    assert t2s("答覆") == "答复"
    assert t2s("覆蓋") == "覆盖"
    assert t2s("神祇") == "神祇"
    # mixed sentence exercising both paths
    assert t2s("乾隆喜歡乾燥的天氣") == "乾隆喜欢干燥的天气"


def test_t2s_char_level_still_available():
    from whisper_tpu.text import t2s_char

    assert t2s_char("漢語") == "汉语"


def test_t2s_high_frequency_chars():
    from whisper_tpu.text import t2s

    assert t2s("寫字") == "写字"
    assert t2s("喜歡") == "喜欢"
    assert t2s("經驗") == "经验"
    assert t2s("軍隊") == "军队"
    assert t2s("政黨") == "政党"
    assert t2s("創造") == "创造"
    assert t2s("強大") == "强大"
    assert t2s("兒子") == "儿子"
    assert t2s("老闆") == "老板"
    assert t2s("諮詢") == "咨询"
