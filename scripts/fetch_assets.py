#!/usr/bin/env python
"""Fetch public assets into assets/ (run on a machine with network access):

- OpenAI BPE vocabs: ``multilingual.tiktoken`` is already vendored;
  ``gpt2.tiktoken`` unlocks the English-only ``.en`` models. The tokenizer
  also accepts WHISPER_TPU_VOCAB pointing at an existing vocab file.
- ``demo.wav`` — the reference's golden zh clip (expected transcript
  recorded at README.md:171-180), used by weights-day step 1.
- ``alignment_heads.json`` — per-model word-timing head masks, dumped from
  the ``whisper`` package when it is importable (they are OpenAI metadata
  carried in the package, not in the checkpoints).
"""
import json
import os
import sys
import urllib.request

BASE = "https://raw.githubusercontent.com/openai/whisper/main/whisper/assets/"
FILES = ("multilingual.tiktoken", "gpt2.tiktoken")
DEMO_URL = "https://raw.githubusercontent.com/ml-inory/whisper.axera/main/demo.wav"
ALIGN_MODELS = ("tiny", "base", "small", "medium", "large-v3", "turbo")


def fetch_alignment_heads(dst: str) -> bool:
    try:
        import whisper  # openai-whisper; optional
    except ImportError:
        print("openai-whisper not installed: skipping alignment_heads.json "
              "(word timing falls back to the last-half-of-layers default; "
              "recipe in docs/WEIGHTS_DAY.md)")
        return False
    out = {}
    for name in ALIGN_MODELS:
        try:
            m = whisper.load_model(name, device="cpu")
            out[name] = m.alignment_heads.indices().T.tolist()
            del m
        except Exception as e:  # noqa: BLE001 — per-model best effort
            print(f"  {name}: {e}")
    if out:
        with open(dst, "w") as f:
            json.dump(out, f)
        print(f"wrote {dst} ({len(out)} models); export "
              f"WHISPER_TPU_ALIGNMENT_HEADS={dst}")
    return bool(out)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    dst_dir = os.path.join(here, "..", "assets")
    os.makedirs(dst_dir, exist_ok=True)
    for name in FILES:
        dst = os.path.join(dst_dir, name)
        if os.path.exists(dst):
            print(f"already present: {dst}")
            continue
        url = BASE + name
        print(f"fetching {url}")
        urllib.request.urlretrieve(url, dst)
        print(f"wrote {dst}")
    demo = os.path.join(here, "..", "demo.wav")
    if not os.path.exists(demo):
        print(f"fetching {DEMO_URL}")
        try:
            urllib.request.urlretrieve(DEMO_URL, demo)
            print(f"wrote {demo}")
        except OSError as e:
            print(f"demo.wav fetch failed ({e}); grab it from the reference "
                  "checkout instead")
    heads = os.path.join(dst_dir, "alignment_heads.json")
    if not os.path.exists(heads):
        fetch_alignment_heads(heads)
    return 0


if __name__ == "__main__":
    sys.exit(main())
