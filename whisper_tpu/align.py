"""Word-level timestamps: DTW over decoder cross-attention.

Beyond-parity capability — the reference emits plain text (plus optional
segment-level timestamp tokens); it has no word timing at all. The semantics
here follow OpenAI Whisper's ``word_timestamps=True`` (whisper/timing.py,
MIT), re-designed TPU-first:

- ONE batched teacher-forced decoder pass returns every layer's
  cross-attention probabilities as MXU matmuls (``alignment_cross_attn``) —
  no per-token host loop and no forward hooks (hooks don't exist under jit).
- The O(S*T) DTW and word grouping run host-side in numpy on the small
  (tokens x audio-frames) matrix.

Alignment-head selection: by default all heads of the last half of the
decoder layers (OpenAI's own default when a model carries no alignment-head
mask, whisper/model.py). Exact per-model masks can be supplied as a JSON
sidecar (``WHISPER_TPU_ALIGNMENT_HEADS`` or ``alignment_heads=``) fetched on
weights day alongside the checkpoints (scripts/fetch_assets.py).
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import HOP_LENGTH, SAMPLE_RATE, WhisperConfig
from .models.model import (
    _gelu,
    _linear,
    _merge_heads,
    _split_heads,
    layer_norm,
)

# seconds per decoder audio frame: encoder downsamples mel 2x
# (conv2 stride 2, model_convert/export_onnx.py:153-181), mel hop = 160
TIME_PER_FRAME = 2 * HOP_LENGTH / SAMPLE_RATE  # 0.02 s


# --------------------------------------------------------------- device pass
@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def alignment_cross_attn(
    params,
    tokens: jnp.ndarray,  # (B, S) int32 — teacher-forced full sequences
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],  # fp (L, B, H, Ta, dh) each
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
):
    """Teacher-forced decoder pass returning cross-attention probabilities.

    Returns (attn (L, B, H, S, Ta) fp32 — softmax over Ta, and
    token_logprobs (B, S-1) fp32 — log P(tokens[:, i+1] | tokens[:, :i+1]),
    used for per-word confidence).

    One compiled program per (B, S) shape; S is bucketed by the caller. The
    whole pass is self/cross/MLP matmuls at sequence length S — MXU-bound,
    unlike the incremental decode loop this pass re-scores.
    """
    dec = params["decoder"]
    dt = compute_dtype
    B, S = tokens.shape
    n_head = cfg.n_text_head
    dh = cfg.head_dim_text

    x = (jnp.take(dec["tok_emb"], tokens, axis=0).astype(dt)
         + dec["pos_emb"][:S][None].astype(dt))
    causal = jnp.tril(jnp.ones((S, S), bool))[None, None]

    def block(carry, inp):
        x = carry
        p, ck, cv = inp  # ck/cv: (B, H, Ta, dh) for this layer
        h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
        q = _split_heads(_linear(h, p["attn"]["wq"], p["attn"]["bq"], dt), n_head)
        k = _split_heads(_linear(h, p["attn"]["wk"], None, dt), n_head)
        v = _split_heads(_linear(h, p["attn"]["wv"], p["attn"]["bv"], dt), n_head)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        s = jnp.where(causal, s, jnp.float32(-1e30))
        o = jnp.einsum("bhqk,bhkd->bhqd",
                       jax.nn.softmax(s, axis=-1).astype(dt), v)
        x = x + _linear(_merge_heads(o), p["attn"]["wo"], p["attn"]["bo"], dt)

        h = layer_norm(x, p["cross_ln"]["g"], p["cross_ln"]["b"])
        qh = _split_heads(_linear(h, p["cross"]["wq"], p["cross"]["bq"], dt),
                          n_head)
        sc = jnp.einsum("bhqd,bhkd->bhqk", qh, ck.astype(dt),
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
        w = jax.nn.softmax(sc, axis=-1)  # (B, H, S, Ta) fp32
        o = jnp.einsum("bhqk,bhkd->bhqd", w.astype(dt), cv.astype(dt))
        x = x + _linear(_merge_heads(o), p["cross"]["wo"], p["cross"]["bo"], dt)

        h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
        x = x + _linear(_gelu(_linear(h, p["mlp"]["w1"], p["mlp"]["b1"], dt)),
                        p["mlp"]["w2"], p["mlp"]["b2"], dt)
        return x, w

    x, attn = jax.lax.scan(block, x, (dec["blocks"],) + tuple(cross_kv))

    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    from .models.model import _logits

    logits = _logits(x, dec, dt)  # (B, S, n_vocab) fp32
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    token_logprobs = jnp.take_along_axis(
        logp, tokens[:, 1:, None], axis=-1)[..., 0]  # (B, S-1)
    return attn, token_logprobs


def _median7_time(arrs: List[jnp.ndarray]) -> jnp.ndarray:
    """Median of 7 same-shaped arrays via a minmax sorting network.

    Element-wise min/max over a Python list lets XLA fuse the whole median
    into one kernel over 7 gathered taps — nothing materializes at 7x the
    map size (the jnp.median(stack) route would)."""
    a = list(arrs)
    if len(a) != 7:
        # generic odd-width fallback (the parameter is part of the public
        # signature; a non-7 width must filter, not crash at trace time):
        # sort the tap stack and take the middle. Costs one materialized
        # stack at width x map size — fine for the rare non-default width.
        stack = jnp.stack(a, axis=-1)
        return jnp.sort(stack, axis=-1)[..., len(a) // 2]

    def mm(i, j):
        lo = jnp.minimum(a[i], a[j])
        hi = jnp.maximum(a[i], a[j])
        a[i], a[j] = lo, hi

    # optimal 16-comparator sorting network for n=7; after it a[3] is the
    # median (verified against np.median in tests/test_align.py)
    for i, j in ((1, 2), (3, 4), (5, 6), (0, 2), (3, 5), (4, 6), (0, 1),
                 (4, 5), (2, 6), (0, 4), (1, 5), (0, 3), (2, 5), (1, 3),
                 (2, 4), (2, 3)):
        mm(i, j)
    return a[3]


def _reflect_taps(frame_len: jnp.ndarray, Ta: int, width: int) -> jnp.ndarray:
    """(B, Ta, width) int32 gather indices for a reflect-padded sliding
    window along time whose boundary sits at the DYNAMIC per-utterance
    audio end (frame_len), matching the host path's crop-then-filter."""
    half = width // 2
    t = jnp.arange(Ta)[None, :, None]                       # (1, Ta, 1)
    k = jnp.arange(width)[None, None, :] - half             # (1, 1, w)
    n = jnp.maximum(frame_len, 1)[:, None, None]            # (B, 1, 1)
    j = jnp.abs(t + k)                                      # reflect at 0
    j = jnp.minimum(j, 2 * (n - 1))                         # clamp tiny n
    j = (n - 1) - jnp.abs((n - 1) - j)                      # reflect at n-1
    return jnp.clip(j, 0, Ta - 1).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "compute_dtype", "medfilt_width"))
def alignment_matrix(
    params,
    tokens: jnp.ndarray,       # (B, S) int32 — teacher-forced sequences
    cross_kv,                  # fp 2-tuple (L, B, H, Ta, dh)
    head_mask: jnp.ndarray,    # (L, H) f32 — 1.0 = alignment head
    row_mask: jnp.ndarray,     # (B, S) bool — text rows (prompt/pad out)
    frame_len: jnp.ndarray,    # (B,) int32 — valid audio frames
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
    medfilt_width: int = 7,
):
    """Teacher-forced pass returning the DEVICE-REDUCED alignment matrix.

    The round-3 path returned the full (L, B, H, S, Ta) fp32 attention
    stack to the host (~215 MB per aligned turbo request over the device
    tunnel; 10+ GB residency at the pipeline's sub-batch, ADVICE r3). All
    of find_alignment's map post-processing is per-head elementwise or a
    token-axis reduction, so it runs here instead: per-(head, frame)
    standardization over the masked text rows, median filter along time
    (reflect boundary at each utterance's audio end), then the
    alignment-head mean — transferring only (B, S, Ta) fp32 (~2.7 MB at
    turbo S=448) plus per-token logprobs.

    Under tensor parallelism the heads axis of cross_kv/params is sharded;
    every per-head op partitions cleanly and the head-mean is the single
    cross-shard reduction, inserted by XLA. ``medfilt_width`` must be odd
    (7 = whisper's default rides the sorting network; other odd widths
    take the generic sorted-stack path).
    """
    if medfilt_width < 1 or medfilt_width % 2 == 0:
        raise ValueError(f"medfilt_width must be odd >= 1, got {medfilt_width}")
    dec = params["decoder"]
    dt = compute_dtype
    B, S = tokens.shape
    n_head = cfg.n_text_head
    dh = cfg.head_dim_text
    Ta = cross_kv[0].shape[3]

    x = (jnp.take(dec["tok_emb"], tokens, axis=0).astype(dt)
         + dec["pos_emb"][:S][None].astype(dt))
    causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
    rows = row_mask[:, None, :, None]                        # (B,1,S,1)
    n_rows = jnp.maximum(jnp.sum(rows, axis=2, keepdims=True), 1.0)
    taps = _reflect_taps(frame_len, Ta, medfilt_width)[:, None]  # (B,1,Ta,w)

    def block(carry, inp):
        x, acc = carry
        p, ck, cv, hmask = inp  # ck/cv: (B, H, Ta, dh); hmask: (H,)
        h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
        q = _split_heads(_linear(h, p["attn"]["wq"], p["attn"]["bq"], dt), n_head)
        k = _split_heads(_linear(h, p["attn"]["wk"], None, dt), n_head)
        v = _split_heads(_linear(h, p["attn"]["wv"], p["attn"]["bv"], dt), n_head)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        s = jnp.where(causal, s, jnp.float32(-1e30))
        o = jnp.einsum("bhqk,bhkd->bhqd",
                       jax.nn.softmax(s, axis=-1).astype(dt), v)
        x = x + _linear(_merge_heads(o), p["attn"]["wo"], p["attn"]["bo"], dt)

        h = layer_norm(x, p["cross_ln"]["g"], p["cross_ln"]["b"])
        qh = _split_heads(_linear(h, p["cross"]["wq"], p["cross"]["bq"], dt),
                          n_head)
        sc = jnp.einsum("bhqd,bhkd->bhqk", qh, ck.astype(dt),
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
        w = jax.nn.softmax(sc, axis=-1)  # (B, H, S, Ta) fp32
        o = jnp.einsum("bhqk,bhkd->bhqd", w.astype(dt), cv.astype(dt))
        x = x + _linear(_merge_heads(o), p["cross"]["wo"], p["cross"]["bo"], dt)

        # --- on-device find_alignment post-processing for this layer ---
        wm = jnp.where(rows, w, 0.0)
        mean = jnp.sum(wm, axis=2, keepdims=True) / n_rows
        var = jnp.sum(jnp.where(rows, (w - mean) ** 2, 0.0),
                      axis=2, keepdims=True) / n_rows
        z = (w - mean) / (jnp.sqrt(var) + 1e-9)
        filt = _median7_time(
            [jnp.take_along_axis(z, taps[..., i][:, :, None, :], axis=3)
             for i in range(medfilt_width)])
        acc = acc + jnp.einsum("bhst,h->bst", filt, hmask)

        h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
        x = x + _linear(_gelu(_linear(h, p["mlp"]["w1"], p["mlp"]["b1"], dt)),
                        p["mlp"]["w2"], p["mlp"]["b2"], dt)
        return (x, acc), None

    acc0 = jnp.zeros((B, S, Ta), jnp.float32)
    (x, acc), _ = jax.lax.scan(
        block, (x, acc0),
        ((dec["blocks"],) + tuple(cross_kv)
         + (head_mask.astype(jnp.float32),)))
    matrix = acc / jnp.maximum(head_mask.sum(), 1.0)

    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    from .models.model import _logits

    logits = _logits(x, dec, dt)  # (B, S, n_vocab) fp32
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    token_logprobs = jnp.take_along_axis(
        logp, tokens[:, 1:, None], axis=-1)[..., 0]  # (B, S-1)
    return matrix, token_logprobs


def dequantize_cross_kv(cross_kv):
    """int8 4-tuple (quantize_cross_kv layout) -> fp 2-tuple (L,B,H,Ta,dh)."""
    if len(cross_kv) == 2:
        return cross_kv
    k_q, k_s, v_q, v_s = cross_kv  # q: (L,B,H,dh,Ta); s: (L,B,H,1,dh)
    k = k_q.transpose(0, 1, 2, 4, 3).astype(jnp.float32) * k_s
    v = v_q.transpose(0, 1, 2, 4, 3).astype(jnp.float32) * v_s
    return k, v


# ----------------------------------------------------------------- host side
def alignment_head_mask(cfg: WhisperConfig,
                        sidecar: Optional[str] = None) -> np.ndarray:
    """(n_text_layer, n_text_head) bool mask of heads used for alignment.

    Sidecar JSON format: ``{"<model-name>": [[layer, head], ...], ...}`` or a
    bare ``[[layer, head], ...]`` list. Default (no sidecar entry): all heads
    of the last half of the layers — OpenAI's fallback for models without a
    stored mask.
    """
    mask = np.zeros((cfg.n_text_layer, cfg.n_text_head), bool)
    sidecar = sidecar or os.environ.get("WHISPER_TPU_ALIGNMENT_HEADS")
    if sidecar and os.path.exists(sidecar):
        data = json.load(open(sidecar))
        pairs = data.get(cfg.name) if isinstance(data, dict) else data
        if pairs:
            for l, h in pairs:
                mask[int(l), int(h)] = True
            return mask
    mask[cfg.n_text_layer // 2:] = True
    return mask


def median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis, reflect-padded (whisper timing)."""
    if width <= 1 or x.shape[-1] <= 1:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotone alignment path through cost (N_text, M_time).

    Classic DTW with (diag, up, left) moves; returns (text_idx, time_idx)
    arrays tracing the minimum-cost path from (0,0) to (N-1,M-1).
    """
    N, M = cost.shape
    D = np.full((N + 1, M + 1), np.inf, np.float64)
    D[0, 0] = 0.0
    trace = np.zeros((N + 1, M + 1), np.int8)
    for i in range(1, N + 1):
        row = cost[i - 1]
        Dp = D[i - 1]
        Di = D[i]
        tr = trace[i]
        left = np.inf
        for j in range(1, M + 1):
            c0, c1, c2 = Dp[j - 1], Dp[j], left
            if c0 <= c1 and c0 <= c2:
                best, t = c0, 0  # diagonal: advance both
            elif c1 <= c2:
                best, t = c1, 1  # up: advance text
            else:
                best, t = c2, 2  # left: advance time
            left = row[j - 1] + best
            Di[j] = left
            tr[j] = t
    # backtrace
    i, j = N, M
    ti: List[int] = []
    tj: List[int] = []
    while i > 0 and j > 0:
        ti.append(i - 1)
        tj.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ti[::-1]), np.array(tj[::-1])


def _word_boundaries(words: List[str], word_tokens: List[List[int]],
                     text_idx: np.ndarray, time_idx: np.ndarray,
                     n_rows: int) -> List[Tuple[int, int]]:
    """Per-word (start_row, end_row) -> (start_frame, end_frame) via the
    DTW path's jump times."""
    # jump_frame[r] = first time index aligned to text row r
    jump = np.zeros(n_rows + 1, int)
    seen = np.zeros(n_rows + 1, bool)
    for r, t in zip(text_idx, time_idx):
        if not seen[r]:
            jump[r] = t
            seen[r] = True
    jump[n_rows] = time_idx[-1] + 1 if len(time_idx) else 0
    # fill gaps (rows never visited inherit the next visited row's time)
    for r in range(n_rows - 1, -1, -1):
        if not seen[r]:
            jump[r] = jump[r + 1]
    out = []
    row = 0
    for toks in word_tokens:
        start = jump[min(row, n_rows)]
        row += len(toks)
        end = jump[min(row, n_rows)]
        out.append((start, end))
    return out


def words_from_attention(
    attn: np.ndarray,  # (L, H, S, Ta) fp32 — ONE utterance's maps
    tokens: Sequence[int],  # full sequence: prompt + text + eot
    prompt_len: int,
    tokenizer,
    cfg: WhisperConfig,
    num_frames: int,  # frames actually covered by audio (<= Ta)
    token_logprobs: Optional[np.ndarray] = None,  # (S-1,)
    head_mask: Optional[np.ndarray] = None,
    medfilt_width: int = 7,
    time_offset: float = 0.0,
) -> List[dict]:
    """Token-to-time DTW then word grouping -> [{word, start, end, prob}].

    Mirrors whisper/timing.py's find_alignment semantics: alignment-head
    maps are per-time-axis standardized, median-filtered, head-averaged;
    DTW over the negative matrix yields monotone token times; words come
    from the tokenizer's script-aware splitter.
    """
    if head_mask is None:
        head_mask = alignment_head_mask(cfg)
    text_tokens = [int(t) for t in tokens[prompt_len:]]
    # rows for text tokens only (prompt rows removed), frames to audio end
    sel = attn[head_mask][:, prompt_len:, :num_frames]  # (Nh, St, F)
    if sel.shape[1] == 0 or sel.shape[2] == 0:
        return []
    mean = sel.mean(axis=-2, keepdims=True)
    std = sel.std(axis=-2, keepdims=True) + 1e-9
    sel = median_filter((sel - mean) / std, medfilt_width)
    matrix = sel.mean(axis=0)  # (St, F)
    return words_from_matrix(matrix, text_tokens, tokenizer,
                             token_logprobs=token_logprobs,
                             prompt_len=prompt_len, time_offset=time_offset)


def words_from_matrix(
    matrix: np.ndarray,  # (St, F) standardized/filtered/head-mean maps
    text_tokens: Sequence[int],  # text rows incl. the trailing eot sentinel
    tokenizer,
    token_logprobs: Optional[np.ndarray] = None,  # (S-1,) full-seq shifted
    prompt_len: int = 0,  # only used to index token_logprobs
    time_offset: float = 0.0,
) -> List[dict]:
    """DTW + word grouping over a precomputed alignment matrix.

    Host half of the split design: :func:`alignment_matrix` produces the
    reduced (S, Ta) matrix on device; this function runs the O(S*T) DTW and
    script-aware word grouping on the cropped rows/frames.

    The trailing eot row is EXCLUDED from the DTW (OpenAI's find_alignment
    crops ``matrix[len(sot_sequence):-1]``): the eot row's diffuse attention
    otherwise drags the last word's end time late. The path's end still
    bounds the final word (sentinel in _word_boundaries).
    """
    text_tokens = [int(t) for t in text_tokens]
    if matrix.shape[0] == 0 or matrix.shape[1] == 0:
        return []
    n_dtw = max(matrix.shape[0] - 1, 1)  # drop the eot row
    text_idx, time_idx = dtw_path(-matrix[:n_dtw].astype(np.float64))

    words, word_tokens = tokenizer.split_to_word_tokens(text_tokens)
    bounds = _word_boundaries(words, word_tokens, text_idx, time_idx,
                              n_rows=n_dtw)
    out = []
    row = 0
    for word, toks, (f0, f1) in zip(words, word_tokens, bounds):
        n = len(toks)
        prob = None
        if token_logprobs is not None:
            # logprob of token i lives at position (i-1) in the shifted array
            lo = prompt_len + row - 1
            lp = token_logprobs[max(lo, 0): lo + n]
            if len(lp):
                prob = float(np.exp(lp.mean()))
        row += n
        if all(t >= tokenizer.eot for t in toks):
            continue  # skip special-token-only "words" (eot, timestamps)
        rec = {
            "word": word,
            "start": round(time_offset + f0 * TIME_PER_FRAME, 3),
            "end": round(time_offset + max(f1, f0) * TIME_PER_FRAME, 3),
        }
        if prob is not None:
            rec["probability"] = round(prob, 4)
        out.append(rec)
    return out


def merge_punctuations(words: List[dict],
                       prepended: str = "\"'“¿([{-",
                       appended: str = "\"'.。,，!！?？:：”)]}、") -> List[dict]:
    """Glue leading/trailing punctuation onto neighbors (whisper semantics)."""
    out: List[dict] = []
    for w in words:
        s = w["word"].strip()
        if out and s and all(c in appended for c in s):
            out[-1] = dict(out[-1], word=out[-1]["word"] + w["word"].strip(),
                           end=w["end"])
        else:
            out.append(dict(w))
    merged: List[dict] = []
    for w in reversed(out):
        s = w["word"].strip()
        if merged and s and all(c in prepended for c in s):
            nxt = merged[-1]
            merged[-1] = dict(nxt, word=w["word"].rstrip() + nxt["word"],
                              start=w["start"])
        else:
            merged.append(w)
    return merged[::-1]
