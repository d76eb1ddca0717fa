#!/usr/bin/env python
"""Fetch public assets (OpenAI multilingual BPE vocab) into assets/.

Run on a machine with network access; the tokenizer also accepts
WHISPER_TPU_VOCAB pointing at an existing multilingual.tiktoken.
"""
import os
import sys
import urllib.request

URL = ("https://raw.githubusercontent.com/openai/whisper/main/"
       "whisper/assets/multilingual.tiktoken")


def main():
    dst_dir = os.path.join(os.path.dirname(__file__), "..", "assets")
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, "multilingual.tiktoken")
    if os.path.exists(dst):
        print(f"already present: {dst}")
        return 0
    print(f"fetching {URL}")
    urllib.request.urlretrieve(URL, dst)
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
