"""CLI argument-surface tests (reference flag names preserved,
python/whisper_cli.py:7-43)."""

from whisper_tpu.cli import get_args


def test_cli_defaults():
    a = get_args(["--wav", "a.wav"])
    assert a.wav == ["a.wav"]
    assert a.model_type == "tiny"
    assert a.language == "zh"
    assert a.task == "transcribe"
    assert a.dtype == "bfloat16"
    assert a.beam == 0 and not a.timestamps and not a.kv_quant


def test_cli_full_flags():
    a = get_args(["-w", "a.wav", "b.wav", "-t", "turbo", "-l", "auto",
                  "--beam", "5", "--timestamps", "--kv_quant",
                  "--max_tokens", "64", "--dtype", "float32"])
    assert a.wav == ["a.wav", "b.wav"]
    assert a.model_type == "turbo" and a.language == "auto"
    assert a.beam == 5 and a.timestamps and a.kv_quant
    assert a.max_tokens == 64 and a.dtype == "float32"
