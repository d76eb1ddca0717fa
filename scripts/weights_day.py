#!/usr/bin/env python
"""Weights day, automated — executes docs/WEIGHTS_DAY.md steps 0-5.

The repo's only unvalidated claim is real-weight WER (egress-blocked in the
build environment). On a networked machine with checkpoints in hand, ONE
command closes it:

    python scripts/weights_day.py --checkpoints_dir /path/to/ckpts \
        --sizes tiny,base,small,turbo

Steps (each logged, each fatal on real runs):
  0. fetch assets (vocabs, demo.wav, alignment-heads sidecar) + AIShell
  1. golden smoke: demo.wav through the tiny checkpoint must transcribe to
     the reference's recorded text (README.md:171-180)
  2. quant re-gate on real logits (eval/quant_gate) — random-init
     thresholds are declared untrusted by the gate itself
  3. per-size WER vs the reference table (README.md:231-238 / BASELINE.md),
     bf16 first then the quantized ladder
  4. quality-gate spot checks (silence -> "", longform plumbing) + a
     fuzzy-merge threshold sweep on real overlapping window decodes
  4b. serving surface: boot `python -m whisper_tpu.serving --dp N`
      (benched defaults + router) and pass the golden/WER spot checks
      through POST /asr — certify what ships, not just the pipeline API
  5. write weights_day_report.{json,md} — paste into BENCH_NOTES/README

``--dry-run`` runs TODAY, offline: synthetic AIShell-format data, random
weights, every stage's plumbing exercised end-to-end with accuracy
assertions skipped (random weights transcribe garbage by design). CI runs
it (tests/test_weights_day.py), so weights day cannot rot.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# reference README.md:231-238 — the targets BASELINE.md commits to
WER_TARGETS = {"tiny": 0.24, "base": 0.18, "small": 0.11, "turbo": 0.06}
GOLDEN_TEXT = "甚至出现交易几乎停止的情况"  # reference README.md:171-180


def log(msg: str):
    print(f"[weights-day] {msg}", flush=True)


def _synthetic_dataset(root: str, n: int = 4):
    """AIShell-format fixture for --dry-run (same shape the eval harness
    consumes: ground_truth.txt + aishell_S0764/*.wav)."""
    import numpy as np

    from whisper_tpu.ops.audio import write_wav

    wav_dir = os.path.join(root, "aishell_S0764")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        utt = f"BAC000{i:02d}"
        write_wav(os.path.join(wav_dir, f"{utt}.wav"),
                  (rng.standard_normal(8000) * 0.05).astype(np.float32))
        lines.append(f"{utt} 测试句子{i}")
    gt = os.path.join(root, "ground_truth.txt")
    with open(gt, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return gt


def _synthetic_demo(root: str) -> str:
    import numpy as np

    from whisper_tpu.ops.audio import write_wav

    path = os.path.join(root, "demo.wav")
    rng = np.random.default_rng(1)
    write_wav(path, (rng.standard_normal(32000) * 0.05).astype(np.float32))
    return path


def step0_fetch(args, report: dict):
    if args.dry_run:
        log("step 0 (fetch): SKIPPED in dry-run (no egress needed)")
        report["fetch"] = "skipped (dry-run)"
        return
    log("step 0: fetching vocabs / demo.wav / alignment heads ...")
    rc = subprocess.call([sys.executable,
                          os.path.join(REPO, "scripts", "fetch_assets.py")])
    if rc != 0:
        raise SystemExit("fetch_assets failed")
    if not os.path.exists(args.gt_path):
        log("fetching AIShell subset (scripts/download_dataset.sh) ...")
        rc = subprocess.call(["bash", os.path.join(REPO, "scripts",
                                                   "download_dataset.sh")])
        if rc != 0:
            raise SystemExit("download_dataset.sh failed")
    report["fetch"] = "ok"


def _ckpt(args, size: str):
    if args.dry_run or not args.checkpoints_dir:
        return None
    for ext in (".pt", ".safetensors"):
        p = os.path.join(args.checkpoints_dir, size + ext)
        if os.path.exists(p):
            return p
    raise SystemExit(f"no checkpoint for '{size}' in {args.checkpoints_dir}")


def step1_golden(args, report: dict):
    log("step 1: golden demo.wav smoke ...")
    from whisper_tpu.ops.audio import load_audio
    from whisper_tpu.pipeline import WhisperPipeline

    size = args.sizes[0]
    pipe = WhisperPipeline(model=("test-nano" if args.dry_run else size),
                           checkpoint=_ckpt(args, size), language="zh",
                           compute_dtype=args.dtype)
    audio = load_audio(args.demo_wav)
    res = pipe.transcribe(audio)
    report["golden"] = {"text": res.text, "expected": GOLDEN_TEXT,
                        "rtf": res.rtf}
    if args.dry_run:
        log(f"  dry-run transcript (random weights): {res.text[:40]!r} — "
            "plumbing ok")
        return
    if res.text.strip() != GOLDEN_TEXT:
        raise SystemExit(
            f"GOLDEN MISMATCH: {res.text!r} != {GOLDEN_TEXT!r} — "
            "checkpoint remap bug; stop before quantization "
            "(WEIGHTS_DAY.md step 1)")
    log(f"  golden ok: {res.text!r}")


def step2_quant_gate(args, report: dict):
    log("step 2: quant gate on real logits ...")
    from whisper_tpu.eval.quant_gate import main as gate_main

    size = args.flagship
    argv = ["--model", "test-nano" if args.dry_run else size,
            "--batch", "2" if args.dry_run else "4",
            "--max_tokens", "4" if args.dry_run else "32",
            "--dtype", "float32"]
    if args.dry_run:
        argv += ["--variants", "int8_weights,w8a8"]
    ck = _ckpt(args, size)
    if ck:
        argv += ["--checkpoint", ck]
    rc = gate_main(argv)
    report["quant_gate"] = {"rc": rc}
    if rc != 0 and not args.dry_run:
        raise SystemExit("quant gate FAILED on real weights — do not ship "
                         "quantized defaults; see WEIGHTS_DAY.md step 2")


def step3_wer(args, report: dict):
    log("step 3: per-size WER ladder ...")
    from whisper_tpu.eval.__main__ import main as eval_main

    table = {}
    for size in args.sizes:
        out = os.path.join(args.workdir, f"wer_{size}.txt")
        argv = ["--dataset", "aishell", "--gt_path", args.gt_path,
                "--model_type", "test-nano" if args.dry_run else size,
                "--language", "zh", "--batch", str(args.batch),
                "--dtype", args.dtype,
                "--log", os.path.join(args.workdir, f"wer_{size}.log"),
                "--out", out]
        ck = _ckpt(args, size)
        if ck:
            argv += ["--checkpoint", ck]
        if args.limit:
            argv += ["--limit", str(args.limit)]
        rc = eval_main(argv)
        if rc != 0:
            raise SystemExit(f"eval harness failed for {size}")
        wer = float(open(out).read().strip())
        target = WER_TARGETS.get(size)
        table[size] = {"wer": wer, "target": target,
                       "pass": (None if target is None or args.dry_run
                                else wer <= target)}
        log(f"  {size}: WER {wer:.4f} (target <= {target})")
    report["wer"] = table
    if not args.dry_run:
        bad = [s for s, r in table.items() if r["pass"] is False]
        if bad:
            raise SystemExit(f"WER targets missed: {bad} — see the ladder "
                             "in WEIGHTS_DAY.md step 3 before quantizing")


def step4_quality(args, report: dict):
    log("step 4: quality-gate spot checks ...")
    import numpy as np

    from whisper_tpu.pipeline import WhisperPipeline

    size = args.sizes[0]
    pipe = WhisperPipeline(model=("test-nano" if args.dry_run else size),
                           checkpoint=_ckpt(args, size), language="zh",
                           compute_dtype=args.dtype)
    silent = np.zeros(16000, np.float32)
    res = pipe.transcribe(silent)
    report["silence_gate"] = {"text": res.text,
                              "no_speech_prob": res.no_speech_prob}
    if not args.dry_run and res.text.strip():
        raise SystemExit("silence gate failed: silent clip produced "
                         f"{res.text!r} (no_speech_prob="
                         f"{res.no_speech_prob:.3f})")
    # longform plumbing: >30 s decodes through the window path
    long = np.zeros(16000 * 35, np.float32)
    rng = np.random.default_rng(2)
    long[: 16000 * 2] = (rng.standard_normal(16000 * 2) * 0.05)
    long[16000 * 26: 16000 * 30] = (rng.standard_normal(16000 * 4) * 0.05)
    res2 = pipe.transcribe(long)
    report["longform"] = {"audio_seconds": res2.audio_seconds}
    assert res2.audio_seconds > 30.0
    # fuzzy-merge threshold sweep on REAL overlapping window decodes
    # (VERDICT r4 weak #5): the junction similarity gate 0.72 was chosen on
    # synthetic near-duplicates; on real weights the merged text must be
    # inspected across gates before the default calcifies
    from whisper_tpu.config import N_SAMPLES
    from whisper_tpu.longform import merge_texts, split_audio

    waves, _ = split_audio(long, N_SAMPLES, pipe.longform_overlap)
    parts = [pipe.transcribe(w).text for w in waves]
    sweep = {str(sim): merge_texts(parts, "zh", similarity=sim)
             for sim in (0.6, 0.72, 0.85)}
    report["merge_sweep"] = {"window_texts": parts, "merged": sweep}
    distinct = len(set(sweep.values()))
    if not args.dry_run and distinct > 1:
        log(f"  WARNING: similarity gate changes the merged text "
            f"({distinct} variants) — inspect report['merge_sweep'] and pin "
            "the best gate (WEIGHTS_DAY.md step 4)")
    log("  quality checks exercised")


def step4b_serving(args, report: dict):
    """Boot the SHIPPED serving entry point (benched defaults behind
    ``python -m whisper_tpu.serving --dp N`` + router) and pass the golden
    and WER spot checks through POST /asr — weights day certifies what
    ships, not just the pipeline API (VERDICT r4 #6)."""
    import signal
    import socket

    log(f"step 4b: serving surface through /asr (--dp {args.serving_dp}) ...")
    from whisper_tpu.serving.client import transcribe_file

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    size = args.sizes[0]
    cmd = [sys.executable, "-m", "whisper_tpu.serving",
           "--host", "127.0.0.1", "--port", str(port),
           "--dp", str(args.serving_dp),
           "--model_type", "test-nano" if args.dry_run else size]
    if args.dry_run:
        cmd += ["--dtype", "float32", "--slots", "2", "--max_tokens", "6",
                "--steps_per_sync", "2"]
    ck = _ckpt(args, size)
    if ck:
        cmd += ["--checkpoint", ck]
    env = dict(os.environ)
    if args.dry_run:
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(cmd, cwd=REPO, env=env, start_new_session=True)
    try:
        import urllib.request

        deadline = time.time() + (300 if args.dry_run else 1800)
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                raise SystemExit(f"serving fleet died rc={proc.returncode}")
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/health", timeout=2) as r:
                    if r.status == 200:
                        up = True
                        break
            except OSError:
                time.sleep(0.5)
        if not up:
            raise SystemExit("serving fleet never became healthy")
        res = transcribe_file(args.demo_wav, "127.0.0.1", port,
                              language="zh", timeout=600)
        report["serving_golden"] = {"text": res.get("text"),
                                    "success": res.get("success")}
        if not res.get("success"):
            raise SystemExit(f"served golden decode failed: {res}")
        if not args.dry_run and res["text"].strip() != GOLDEN_TEXT:
            raise SystemExit(
                f"SERVED GOLDEN MISMATCH: {res['text']!r} != {GOLDEN_TEXT!r}"
                " — the serving tier disagrees with the pipeline")
        # WER spot checks through the wire: first utterances of the dataset
        import wave as _wave

        gt_dir = os.path.dirname(args.gt_path)
        spots = []
        with open(args.gt_path, encoding="utf-8") as f:
            for line in list(f)[:2]:
                utt, gt_text = line.strip().split(" ", 1)
                wav = os.path.join(gt_dir, "aishell_S0764", f"{utt}.wav")
                if not os.path.exists(wav):
                    continue
                r = transcribe_file(wav, "127.0.0.1", port, language="zh",
                                    timeout=600)
                if not r.get("success"):
                    raise SystemExit(f"served WER spot decode failed: {r}")
                spots.append({"utt": utt, "gt": gt_text,
                              "text": r.get("text")})
        report["serving_spots"] = spots
        log(f"  served golden + {len(spots)} WER spots through /asr ok")
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass


def step5_record(args, report: dict):
    jpath = os.path.join(args.workdir, "weights_day_report.json")
    with open(jpath, "w", encoding="utf-8") as f:
        json.dump(report, f, ensure_ascii=False, indent=2)
    mpath = os.path.join(args.workdir, "weights_day_report.md")
    with open(mpath, "w", encoding="utf-8") as f:
        f.write("# Weights day report\n\n")
        f.write(f"mode: {'DRY-RUN (random weights)' if args.dry_run else 'REAL'}\n\n")
        if "wer" in report:
            f.write("| model | WER | target | pass |\n|---|---|---|---|\n")
            for size, r in report["wer"].items():
                f.write(f"| {size} | {r['wer']:.4f} | {r['target']} | "
                        f"{r['pass']} |\n")
        f.write("\nPaste this table into BENCH_NOTES.md and README.md "
                "(WEIGHTS_DAY.md step 5); re-run `python bench.py` for the "
                "trained-weight ragged row.\n")
    log(f"step 5: report written to {jpath} and {mpath}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser("weights_day")
    p.add_argument("--checkpoints_dir", default=None,
                   help="dir with <size>.pt or <size>.safetensors")
    p.add_argument("--sizes", default="tiny,base,small,turbo")
    p.add_argument("--flagship", default="turbo",
                   help="size used for the quant re-gate")
    p.add_argument("--gt_path", default="datasets/ground_truth.txt")
    p.add_argument("--demo_wav", default="demo.wav")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--workdir", default=".")
    p.add_argument("--serving_dp", type=int, default=2,
                   help="data-parallel replicas for the step-4b serving "
                        "check (needs that many chips on real hardware; "
                        "1 = single server, no router)")
    p.add_argument("--dry-run", dest="dry_run", action="store_true",
                   help="offline rehearsal: synthetic data, random weights, "
                        "accuracy assertions skipped")
    args = p.parse_args(argv)
    args.sizes = [s for s in args.sizes.split(",") if s]

    os.makedirs(args.workdir, exist_ok=True)
    if args.dry_run:
        # rehearsal runs on the CPU backend (the axon sitecustomize rewrites
        # JAX_PLATFORMS, so pin it via jax.config like tests/conftest.py)
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.dtype = "float32"
        args.batch = min(args.batch, 4)
        args.limit = args.limit or 4
        args.gt_path = _synthetic_dataset(args.workdir)
        args.demo_wav = _synthetic_demo(args.workdir)
        args.sizes = args.sizes[:1]
        args.flagship = args.sizes[0]
    elif not args.checkpoints_dir:
        p.error("--checkpoints_dir is required outside --dry-run")

    t0 = time.time()
    report: dict = {"dry_run": args.dry_run, "sizes": args.sizes}
    step0_fetch(args, report)
    step1_golden(args, report)
    step2_quant_gate(args, report)
    step3_wer(args, report)
    step4_quality(args, report)
    step4b_serving(args, report)
    report["wall_seconds"] = round(time.time() - t0, 1)
    step5_record(args, report)
    log(f"DONE in {report['wall_seconds']}s"
        + (" (dry-run: accuracy unvalidated by design)" if args.dry_run
           else " — WER half of the north star closed"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
