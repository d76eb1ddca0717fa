#!/usr/bin/env python
"""Fetch public assets (OpenAI BPE vocabs) into assets/.

Run on a machine with network access. ``multilingual.tiktoken`` is already
vendored; ``gpt2.tiktoken`` is needed only for the English-only ``.en``
models. The tokenizer also accepts WHISPER_TPU_VOCAB pointing at an
existing vocab file.
"""
import os
import sys
import urllib.request

BASE = "https://raw.githubusercontent.com/openai/whisper/main/whisper/assets/"
FILES = ("multilingual.tiktoken", "gpt2.tiktoken")


def main():
    dst_dir = os.path.join(os.path.dirname(__file__), "..", "assets")
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
