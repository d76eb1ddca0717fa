"""WER eval entry point — counterpart of python/test_wer.py:249-303.

    python -m whisper_tpu.eval --dataset aishell \
        --gt_path datasets/ground_truth.txt --model_type small \
        --checkpoint small.pt --batch 32
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser("whisper_tpu.eval")
    p.add_argument("--dataset", "-d", default="aishell", choices=["aishell", "commonvoice"])
    p.add_argument("--gt_path", required=True, help="ground-truth txt / tsv file")
    p.add_argument("--wav_dir", default=None)
    p.add_argument("--model_type", "-t", default="tiny")
    p.add_argument("--checkpoint", "-p", default=None)
    p.add_argument("--language", "-l", default="zh")
    p.add_argument("--level", default="char", choices=["char", "word"],
                   help="char = reference zh metric; word = spaced-language WER")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--log", default="test_wer.log")
    p.add_argument("--out", default="wer.txt")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, stream=sys.stdout, format="%(message)s")

    from ..pipeline import WhisperPipeline
    from .wer import AIShellDataset, CommonVoiceDataset, evaluate

    ds = (
        AIShellDataset(args.gt_path, args.wav_dir)
        if args.dataset == "aishell"
        else CommonVoiceDataset(args.gt_path, args.wav_dir)
    )
    pipe = WhisperPipeline(
        model=args.model_type,
        checkpoint=args.checkpoint,
        language=args.language,
        compute_dtype=args.dtype,
    )
    res = evaluate(pipe, ds, batch_size=args.batch, language=args.language,
                   limit=args.limit, log_path=args.log, level=args.level)
    with open(args.out, "w") as f:
        f.write(f"{res.wer:.6f}\n")
    print(f"Total WER: {res.wer:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
