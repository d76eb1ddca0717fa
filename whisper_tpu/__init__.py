"""whisper_tpu — a TPU-native Whisper ASR serving stack.

Built from scratch for TPU (JAX/XLA/Pallas/pjit) with the capability surface
of the ml-inory/whisper.axera edge-NPU deployment: all model sizes
(tiny..large-v3, turbo, distil), transcribe/translate across 99+ languages,
CLI, HTTP server, WER eval harness, and direct checkpoint ingestion — plus
what the reference lacks: batching, beam search, language auto-detection,
device-resident decode loops, multi-chip sharding and quantized serving.
"""

from .config import WhisperConfig, get_config, PRESETS
from .pipeline import WhisperPipeline, TranscribeResult
from .tokenizer import Tokenizer, get_tokenizer, LANGUAGES

__version__ = "0.1.0"


def __getattr__(name):  # lazy heavyweight entry points
    if name == "greedy_decode":
        from .decode import greedy_decode

        return greedy_decode
    if name == "beam_search":
        from .beam import beam_search

        return beam_search
    if name == "write_result":
        from .formats import write_result

        return write_result
    raise AttributeError(name)


__all__ = [
    "WhisperConfig",
    "get_config",
    "PRESETS",
    "WhisperPipeline",
    "TranscribeResult",
    "Tokenizer",
    "get_tokenizer",
    "LANGUAGES",
    "greedy_decode",
    "beam_search",
    "write_result",
    "__version__",
]
