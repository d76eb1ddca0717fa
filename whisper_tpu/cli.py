"""Command-line front-end.

Counterpart of python/whisper_cli.py / cpp/whisper_cli.cpp: transcribe one or
many files, print text + RTF. Adds batch mode and language auto-detection.

Usage:
    python -m whisper_tpu.cli --wav demo.wav --model_type tiny --language zh
    python -m whisper_tpu.cli --wav a.wav b.wav --model_type base --language auto
"""

from __future__ import annotations

import argparse
import sys
import time


def get_args(argv=None):
    p = argparse.ArgumentParser("whisper_tpu", description="TPU-native Whisper ASR")
    # flag names follow the reference CLI (python/whisper_cli.py:7-43)
    p.add_argument("--wav", "-w", nargs="+", required=True, help="input WAV file(s)")
    p.add_argument("--model_type", "-t", default="tiny",
                   help="tiny|base|small|medium|large-v3|turbo|distil-large-v3")
    p.add_argument("--checkpoint", "-p", default=None,
                   help="OpenAI .pt / HF dir / .safetensors weights (random init if omitted)")
    p.add_argument("--language", "-l", default="zh", help="language code or 'auto'")
    p.add_argument("--task", default="transcribe", choices=["transcribe", "translate"])
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--beam", type=int, default=0, help="beam size (0/1 = greedy)")
    p.add_argument("--timestamps", action="store_true", help="emit timestamp tokens")
    p.add_argument("--quantize", action="store_true",
                   help="int8-quantize attention/MLP weights (fp32 islands kept)")
    p.add_argument("--quantize_logits", action="store_true",
                   help="int8 logits-embedding copy (halves the decode "
                        "step's largest weight read; gate with quant_gate)")
    p.add_argument("--kv_quant", action="store_true",
                   help="int8-quantize the cross-attention KV cache")
    p.add_argument("--self_kv_quant", action="store_true",
                   help="int8-quantize the self-attention KV cache")
    p.add_argument("--max_tokens", type=int, default=None,
                   help="cap on generated tokens (default: model ctx limit)")
    p.add_argument("--longform", action="store_true",
                   help="seek-based long-form (timestamp-conditioned windows)")
    p.add_argument("--no_condition", action="store_true",
                   help="disable condition-on-previous-text in --longform")
    p.add_argument("--initial_prompt", default=None,
                   help="free text to prime the decoder with (names, jargon, "
                        "style) — prepended as [sot_prev, tokens] context")
    p.add_argument("--word_timestamps", action="store_true",
                   help="per-word timings via cross-attention DTW (align.py)")
    p.add_argument("--alignment_heads", default=None,
                   help="JSON sidecar with per-model alignment-head masks "
                        "(default: last half of the decoder layers)")
    p.add_argument("--output_format", "-f", default="txt",
                   choices=["txt", "json", "srt", "vtt", "tsv"],
                   help="transcript format; srt/vtt/tsv need --timestamps "
                        "or --word_timestamps for segment times")
    p.add_argument("--output_dir", "-o", default=None,
                   help="write one <input-stem>.<format> per input here "
                        "(default: print to stdout)")
    p.add_argument("--spec_draft", default=None,
                   help="draft model size for speculative decoding "
                        "(spec_decode.py; greedy-only — implies the OpenAI "
                        "suppression filters are OFF)")
    p.add_argument("--spec_draft_checkpoint", default=None,
                   help="draft checkpoint path (.pt/safetensors)")
    p.add_argument("--spec_gamma", type=int, default=4,
                   help="draft tokens proposed per verify window")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = get_args(argv)
    from .utils import compilation_cache

    compilation_cache.enable()
    from .pipeline import WhisperPipeline

    t0 = time.perf_counter()
    pipe = WhisperPipeline(
        model=args.model_type,
        checkpoint=args.checkpoint,
        language=None if args.language == "auto" else args.language,
        task=args.task,
        compute_dtype=args.dtype,
        beam_size=args.beam,
        timestamps=args.timestamps,
        max_tokens=args.max_tokens,
        initial_prompt=args.initial_prompt,
        quantize=args.quantize,
        quantize_logits=args.quantize_logits,
        kv_quant=args.kv_quant,
        self_kv_quant=args.self_kv_quant,
        condition_on_previous_text=not args.no_condition,
        word_timestamps=args.word_timestamps,
        alignment_heads=args.alignment_heads,
        # spec decode is argmax-only; the suppression grammar is
        # sequential state the verify window cannot replay
        apply_filters=not (args.spec_draft or args.spec_draft_checkpoint),
        spec_draft=args.spec_draft,
        spec_draft_checkpoint=args.spec_draft_checkpoint,
        spec_gamma=args.spec_gamma,
    )
    if args.spec_draft or args.spec_draft_checkpoint:
        print("speculative decoding: suppression filters disabled "
              "(greedy/argmax-only path)", file=sys.stderr)
    print(f"Init model cost: {time.perf_counter() - t0:.3f}s", file=sys.stderr)

    if args.longform:
        results = pipe.transcribe_longform(args.wav)
    else:
        results = pipe.transcribe_batch(args.wav)
    for path, r in zip(args.wav, results):
        if args.output_dir:
            import os

            from .formats import write_result

            stem = os.path.splitext(os.path.basename(path))[0]
            dest = os.path.join(args.output_dir, f"{stem}.{args.output_format}")
            os.makedirs(args.output_dir, exist_ok=True)
            with open(dest, "w", encoding="utf-8") as f:
                write_result(r, args.output_format, f)
            print(f"{path} -> {dest}", file=sys.stderr)
        elif args.output_format != "txt":
            from .formats import write_result

            write_result(r, args.output_format, sys.stdout)
        else:
            print(f"{path}\t[{r.language}]\t{r.text}")
            if args.word_timestamps and r.words:
                for w in r.words:
                    print(f"  {w['start']:7.2f} -> {w['end']:7.2f}  {w['word']}")
        print(
            f"  audio {r.audio_seconds:.2f}s  wall {r.wall_seconds:.2f}s  RTF {r.rtf:.4f}",
            file=sys.stderr,
        )
    if pipe.last_spec_stats is not None:
        s = pipe.last_spec_stats
        print(f"speculative: acceptance {s['acceptance']:.1%} "
              f"({s['accepted']}/{s['drafted']} draft tokens, "
              f"{s['rounds']} rounds)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
