"""End-to-end ASR pipeline: audio -> mel -> encode -> decode -> text.

The TPU-native counterpart of the reference's ``class Whisper``
(python/whisper.py:35-271, cpp/src/Whisper.{hpp,cpp}): model loading, feature
extraction, generation and detokenization behind one object — but batched,
jit-compiled end-to-end, and with auto language detection the reference only
stubs (cpp/src/api/ax_whisper_api.h:40).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import N_SAMPLES, get_config
from .decode import (
    detect_language_kv,
    encode_cross_kv,
    extract_texts,
    greedy_decode_kv,
    index_cross_kv,
)
from .models.checkpoint import load_checkpoint
from .models.model import init_params
from .ops.audio import load_audio
from .ops.mel import log_mel_batch
from .text import postprocess
from .tokenizer import LANGUAGES, Tokenizer, get_tokenizer


@dataclass
class TranscribeResult:
    text: str
    language: str
    tokens: np.ndarray
    audio_seconds: float
    wall_seconds: float
    no_speech_prob: float = 0.0
    segments_list: Optional[list] = None  # explicit segments (longform seek)
    words: Optional[list] = None  # [{word, start, end, probability}] (align.py)

    @property
    def rtf(self) -> float:
        """Real-time factor = wall / audio duration (python/whisper_cli.py:62-66)."""
        return self.wall_seconds / max(self.audio_seconds, 1e-9)

    @property
    def segments(self):
        """[(start_s, end_s, text)] when decoded with timestamps, else []."""
        if self.segments_list is not None:
            return self.segments_list
        from .text import parse_segments

        return parse_segments(self.text)


class WhisperPipeline:
    """Load once, transcribe many — batched, single compiled decode program."""

    # class-level defaults so minimal hand-built pipelines (tests construct
    # via __new__ to skip the heavy init) take the no-draft path
    draft_params = None
    draft_cfg = None
    spec_gamma = 4
    last_spec_stats: Optional[dict] = None

    def __init__(
        self,
        model: str = "tiny",
        checkpoint: Optional[str] = None,
        language: Optional[str] = "zh",
        task: str = "transcribe",
        compute_dtype: str = "float32",
        vocab_path: Optional[str] = None,
        seed: int = 0,
        beam_size: int = 0,
        timestamps: bool = False,
        max_tokens: Optional[int] = None,
        apply_filters: bool = True,
        quantize: bool = False,
        quantize_logits: bool = False,
        kv_quant: bool = False,
        self_kv_quant: bool = False,
        temperature: float = 0.0,
        temperature_fallback: Optional[bool] = None,
        compression_ratio_threshold: float = 2.4,
        logprob_threshold: float = -1.0,
        no_speech_threshold: float = 0.6,
        condition_on_previous_text: bool = True,
        initial_prompt: Optional[str] = None,
        longform_overlap_s: float = 2.0,
        word_timestamps: bool = False,
        alignment_heads: Optional[str] = None,
        spec_draft: Optional[str] = None,
        spec_draft_checkpoint: Optional[str] = None,
        spec_gamma: int = 4,
    ):
        assert task in ("transcribe", "translate")
        self.task = task
        self.language = language  # None => auto-detect per utterance
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.beam_size = beam_size
        self.timestamps = timestamps
        self.max_tokens = max_tokens
        self.apply_filters = apply_filters
        self.kv_quant = kv_quant
        self.self_kv_quant = self_kv_quant
        self.temperature = temperature
        # whisper's retry ladder only makes sense with trained weights
        self.temperature_fallback = (
            temperature_fallback if temperature_fallback is not None
            else checkpoint is not None)
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self.no_speech_threshold = no_speech_threshold
        # used by the seek-based long-form path (longform.transcribe_seek)
        self.condition_on_previous_text = condition_on_previous_text
        # OpenAI --initial_prompt: free text prepended as [sot_prev, tokens]
        # context (vocabulary/style priming); the reference has no analog
        self.initial_prompt = initial_prompt
        # fixed-window long-form: overlap between windows so merge_texts'
        # duplicate trimming is live (0 would bisect words at boundaries)
        self.longform_overlap = int(longform_overlap_s * 16000)
        # word-level timing (align.py): one extra teacher-forced decoder
        # pass per batch; beyond-parity (the reference has no word timing).
        # Applies to transcribe_batch (fixed-window) — the seek-based
        # transcribe_longform path reports segment times instead.
        self.word_timestamps = word_timestamps
        self.alignment_heads = alignment_heads

        if checkpoint is not None:
            self.params, self.cfg = load_checkpoint(checkpoint, size=model)
        else:
            self.cfg = get_config(model)
            self.params = init_params(self.cfg, jax.random.PRNGKey(seed))
        if quantize:
            from .ops.quant import quantize_params

            self.params = quantize_params(self.params)
        if quantize_logits:
            from .ops.quant import quantize_logits_emb

            self.params = quantize_logits_emb(self.params)
        from .models.model import cast_floating

        self.params = cast_floating(self.params, self.compute_dtype)

        self.tokenizer: Tokenizer = get_tokenizer(
            self.cfg.is_multilingual,
            num_languages=self.cfg.num_languages,
            language=language,
            task=task,
            vocab_path=vocab_path,
        )
        from .sampling import build_suppress_ids

        self._suppress_ids = (
            build_suppress_ids(self.cfg, self.tokenizer) if apply_filters else None
        )

        # speculative decoding (spec_decode.py): a draft checkpoint proposes
        # spec_gamma tokens per target verify window. Greedy/argmax only —
        # the OpenAI suppression grammar is sequential state the verify
        # window cannot replay, so the combination is rejected up front
        # rather than silently ignored.
        self.spec_gamma = spec_gamma
        self.draft_params = None
        self.draft_cfg = None
        self.last_spec_stats: Optional[dict] = None
        if spec_draft or spec_draft_checkpoint:
            if apply_filters or timestamps or (beam_size and beam_size > 1) \
                    or temperature > 0:
                raise ValueError(
                    "speculative decoding is greedy/argmax-only: use "
                    "apply_filters=False, timestamps=False, beam_size<=1, "
                    "temperature=0 (spec_decode.py docstring)")
            if spec_draft_checkpoint is not None:
                self.draft_params, self.draft_cfg = load_checkpoint(
                    spec_draft_checkpoint, size=spec_draft or "tiny")
            else:
                if checkpoint is not None:
                    # a real target with a random-init draft silently decodes
                    # correctly but ~gamma-times SLOWER (acceptance ~0) —
                    # the one misconfiguration that defeats the feature's
                    # entire point, so reject it instead of warning
                    raise ValueError(
                        "target has a real checkpoint but the draft would "
                        "be random-init (acceptance ~0, pure slowdown): "
                        "pass spec_draft_checkpoint")
                self.draft_cfg = get_config(spec_draft)
                self.draft_params = init_params(
                    self.draft_cfg, jax.random.PRNGKey(seed + 1))
            if self.draft_cfg.n_vocab != self.cfg.n_vocab:
                raise ValueError(
                    f"draft vocab {self.draft_cfg.n_vocab} != target "
                    f"{self.cfg.n_vocab}: draft and target must share a "
                    f"tokenizer")
            if quantize:
                from .ops.quant import quantize_params

                self.draft_params = quantize_params(self.draft_params)
            self.draft_params = cast_floating(self.draft_params,
                                              self.compute_dtype)

    # ------------------------------------------------------------------
    def _prepare_batch(self, waves: Sequence[np.ndarray]):
        lengths = np.array([min(len(w), N_SAMPLES) for w in waves], np.int32)
        batch = np.zeros((len(waves), N_SAMPLES), np.float32)
        for i, w in enumerate(waves):
            batch[i, : lengths[i]] = w[: lengths[i]]
        return jnp.asarray(batch), jnp.asarray(lengths), lengths / 16000.0

    def _prompt(self, language: str) -> np.ndarray:
        return np.asarray(self.cfg.sot_sequence(language, self.task), np.int32)

    def transcribe_batch(
        self,
        audios: Sequence[Union[str, bytes, np.ndarray]],
        language: Optional[str] = None,
    ) -> List[TranscribeResult]:
        """Batched transcription; one device program per (batch, prompt) shape.

        Audio longer than 30 s is split into windows and the windows of ALL
        utterances decode as one flat batch (the reference truncates instead,
        python/whisper.py:148-152); per-utterance texts are re-merged after.
        """
        from .longform import merge_texts, split_audio

        t0 = time.perf_counter()
        language = language or self.language
        waves = [load_audio(a) for a in audios]
        chunk_lists = [split_audio(w, overlap_samples=self.longform_overlap)[0]
                       for w in waves]
        flat_waves = [c for cl in chunk_lists for c in cl]
        n_chunks = [len(cl) for cl in chunk_lists]
        batch, lengths, secs = self._prepare_batch(flat_waves)
        mel = log_mel_batch(batch, lengths, n_mels=self.cfg.n_mels)
        # configs with a shorter audio context (tests, distil variants) take
        # the leading frames — same contract as the serving engine
        mel = mel[..., : 2 * self.cfg.n_audio_ctx]

        # ONE encoder pass feeds language detection, decode and the retry
        # ladder (the reference's closest analog is its DMA'd cross-KV
        # handoff, cpp/src/Whisper.cpp:260-288)
        cross_kv = encode_cross_kv(self.params, mel, self.cfg,
                                   self.compute_dtype, kv_quant=self.kv_quant)
        if language is None:
            lang_idx, _ = detect_language_kv(
                self.params, cross_kv, self.cfg, self.compute_dtype)
            codes = list(LANGUAGES.keys())
            langs = [codes[int(i)] for i in np.asarray(lang_idx)]  # per chunk
        else:
            langs = [language] * len(flat_waves)

        prompts = np.stack([self._prompt(l) for l in langs])
        if self.timestamps:
            prompts = prompts[:, :-1]  # drop <|notimestamps|>
        sot_index = 0
        if self.initial_prompt:
            # [sot_prev, *prompt_tokens] prefix (OpenAI initial_prompt);
            # same prefix for every stream, so no left-pad is needed
            ptoks = self.tokenizer.encode(
                " " + self.initial_prompt.strip())[- (self.cfg.n_text_ctx // 2 - 1):]
            prefix = np.asarray([self.cfg.sot_prev, *ptoks], np.int32)
            prompts = np.concatenate(
                [np.tile(prefix[None], (len(prompts), 1)), prompts], axis=1)
            sot_index = len(prefix)
        suppress = jnp.asarray(self._suppress_ids) if self._suppress_ids is not None else None
        if self.beam_size and self.beam_size > 1:
            from .beam import beam_search_kv

            result = beam_search_kv(
                self.params,
                cross_kv,
                jnp.asarray(prompts),
                self.cfg,
                beam_size=self.beam_size,
                compute_dtype=self.compute_dtype,
                max_tokens=self.max_tokens,
                suppress_ids=suppress,
                timestamps=self.timestamps,
                apply_filters=self.apply_filters,
                self_kv_quant=self.self_kv_quant,
                sot_index=sot_index,
            )
        elif self.draft_params is not None:
            from .spec_decode import speculative_decode_kv

            # the draft encodes the same audio with ITS OWN mel bank (the
            # 80- vs 128-bin filterbanks are different frequency maps — a
            # slice of the target's mel would feed the draft garbage and
            # destroy acceptance)
            if self.draft_cfg.n_mels != self.cfg.n_mels:
                mel_d = log_mel_batch(batch, lengths,
                                      n_mels=self.draft_cfg.n_mels)
            else:
                mel_d = mel
            mel_d = mel_d[..., : 2 * self.draft_cfg.n_audio_ctx]
            cross_d = encode_cross_kv(
                self.draft_params, mel_d, self.draft_cfg,
                self.compute_dtype, kv_quant=self.kv_quant)
            result = speculative_decode_kv(
                self.params, cross_kv, self.draft_params, cross_d,
                jnp.asarray(prompts), self.cfg, self.draft_cfg,
                gamma=self.spec_gamma, compute_dtype=self.compute_dtype,
                max_tokens=self.max_tokens,
                self_kv_quant=self.self_kv_quant, sot_index=sot_index)
            self.last_spec_stats = {
                "accepted": int(result.accepted),
                "drafted": int(result.drafted),
                "rounds": int(result.rounds),
                "acceptance": (int(result.accepted)
                               / max(int(result.drafted), 1)),
            }
        else:
            result = greedy_decode_kv(
                self.params,
                cross_kv,
                jnp.asarray(prompts),
                self.cfg,
                compute_dtype=self.compute_dtype,
                max_tokens=self.max_tokens,
                suppress_ids=suppress,
                timestamps=self.timestamps,
                apply_filters=self.apply_filters,
                self_kv_quant=self.self_kv_quant,
                temperature=self.temperature,
                sot_index=sot_index,
            )
        # OpenAI's temperature ladder falls back from beam/greedy at t=0 to
        # sampling at increasing temperatures; it applies to both paths
        if self.temperature_fallback:
            result = self._temperature_retry(result, cross_kv, prompts,
                                             suppress, sot_index=sot_index)
        texts = extract_texts(result, prompts.shape[1], self.tokenizer,
                              timestamps=self.timestamps)
        silent = self._silence_mask(result)
        texts = ["" if s else t for t, s in zip(texts, silent)]
        toks = np.asarray(result.tokens)
        lens = np.asarray(result.lengths)
        nsp = (np.asarray(result.no_speech_prob)
               if hasattr(result, "no_speech_prob") else np.zeros(len(toks)))

        chunk_words = None
        if self.word_timestamps:
            chunk_words = self._align_words(
                cross_kv, toks, lens, prompts.shape[1],
                np.asarray(lengths), langs, silent)
        wall = time.perf_counter() - t0

        # regroup flat chunks back into utterances
        window_step_s = (N_SAMPLES - self.longform_overlap) / 16000.0
        overlap_s = self.longform_overlap / 16000.0
        out = []
        pos = 0
        from .longform import merge_window_words, text_from_words

        for u, nc in enumerate(n_chunks):
            chunk_texts = texts[pos : pos + nc]
            lang = langs[pos]  # utterance language = first chunk's
            utt_tokens = np.concatenate(
                [toks[pos + j, prompts.shape[1] : lens[pos + j]] for j in range(nc)])
            words = None
            if chunk_words is not None:
                # word-level overlap reconciliation: midpoint cut on start
                # times with silence fallback (longform.merge_window_words)
                words = merge_window_words(chunk_words[pos : pos + nc],
                                           window_step_s, overlap_s)
            if words is not None and nc > 1:
                # derive the text from the merged words so text and words
                # cannot disagree at window boundaries (ADVICE r3)
                merged = text_from_words(words, lang)
            elif nc > 1:
                merged = merge_texts(chunk_texts, lang)
            else:
                merged = chunk_texts[0]
            out.append(
                TranscribeResult(
                    text=postprocess(merged, lang),
                    language=lang,
                    tokens=utt_tokens,
                    audio_seconds=len(waves[u]) / 16000.0,
                    wall_seconds=wall / len(audios),
                    no_speech_prob=float(nsp[pos]),
                    words=words,
                )
            )
            pos += nc
        return out

    def _align_words(self, cross_kv, toks, lens, prompt_len, sample_lens,
                     langs, silent):
        """Per-chunk word timings via one teacher-forced alignment pass
        (align.alignment_matrix). The head selection, per-column
        standardization, median filter and head-mean all run ON DEVICE, so
        only the reduced (b, S, Ta) matrix crosses to the host — not the
        full (L, b, H, S, Ta) fp32 attention stack (10+ GB at turbo
        sub-batch 8, ADVICE r3). Sub-batches of 8 bound the per-layer
        transient inside the pass."""
        import dataclasses as _dc
        import math

        from .align import (
            alignment_head_mask,
            alignment_matrix,
            dequantize_cross_kv,
            merge_punctuations,
            words_from_matrix,
        )

        fp_kv = dequantize_cross_kv(cross_kv)
        head_mask = jnp.asarray(
            alignment_head_mask(self.cfg, self.alignment_heads), jnp.float32)
        n = len(toks)
        words: List[list] = [[] for _ in range(n)]
        for lo in range(0, n, 8):
            hi = min(lo + 8, n)
            smax = int(max(lens[lo:hi])) + 1
            S = min(max(32, 32 * math.ceil(smax / 32)), self.cfg.n_text_ctx)
            seqs = np.full((hi - lo, S), self.cfg.eot, np.int32)
            row_mask = np.zeros((hi - lo, S), bool)
            frame_len = np.zeros((hi - lo,), np.int32)
            for i in range(lo, hi):
                L = min(int(lens[i]) + 1, S)
                seqs[i - lo, :L] = toks[i, :L]
                row_mask[i - lo, prompt_len:L] = True
                frame_len[i - lo] = min(int(np.ceil(sample_lens[i] / 320)),
                                        self.cfg.n_audio_ctx)
            matrix, tlp = alignment_matrix(
                self.params, jnp.asarray(seqs),
                tuple(a[:, lo:hi] for a in fp_kv), head_mask,
                jnp.asarray(row_mask), jnp.asarray(frame_len),
                self.cfg, self.compute_dtype)
            matrix = np.asarray(matrix, np.float32)  # (b, S, Ta)
            tlp = np.asarray(tlp, np.float32)
            for i in range(lo, hi):
                if silent[i]:
                    continue  # gated to "" — no words
                frames = int(frame_len[i - lo])
                L = min(int(lens[i]) + 1, S)
                tok = _dc.replace(self.tokenizer, language=langs[i])
                ws = words_from_matrix(
                    matrix[i - lo, prompt_len:L, :frames],
                    seqs[i - lo, prompt_len:L], tok,
                    token_logprobs=tlp[i - lo], prompt_len=prompt_len)
                if langs[i] not in ("zh", "ja", "th", "lo", "my", "yue"):
                    ws = merge_punctuations(ws)
                words[i] = ws
        return words

    # ------------------------------------------------------------------
    @staticmethod
    def _compression_ratio(text: str) -> float:
        import zlib

        raw = text.encode("utf-8")
        if not raw:
            return 0.0
        return len(raw) / max(len(zlib.compress(raw)), 1)

    def _silence_mask(self, result) -> np.ndarray:
        from .longform import silence_mask

        return silence_mask(result, self.no_speech_threshold,
                            self.logprob_threshold)

    def _needs_retry(self, result, prompts) -> np.ndarray:
        """OpenAI failure criteria: repetitive text or low confidence —
        except silent segments, which are skipped, not retried."""
        texts = extract_texts(result, prompts.shape[1], self.tokenizer,
                              timestamps=self.timestamps)
        avg_lp = np.asarray(result.avg_logprob)
        bad = np.zeros(len(texts), bool)
        for i, t in enumerate(texts):
            if self._compression_ratio(t) > self.compression_ratio_threshold:
                bad[i] = True
            elif avg_lp[i] < self.logprob_threshold:
                bad[i] = True
        return bad & ~self._silence_mask(result)

    def _temperature_retry(self, result, cross_kv, prompts, suppress,
                           sot_index: int = 0):
        """Whisper's temperature ladder: re-decode failed utterances at
        increasing temperatures until the quality criteria pass (OpenAI
        decode semantics the reference has no equivalent of). Reuses the
        batch's cross-KV — the encoder never re-runs."""
        ladder = [t for t in (0.2, 0.4, 0.6, 0.8, 1.0) if t > self.temperature]
        for temp in ladder:
            bad = self._needs_retry(result, prompts)
            if not bad.any():
                break
            idx = np.nonzero(bad)[0]
            sub = greedy_decode_kv(
                self.params,
                index_cross_kv(cross_kv, idx),
                jnp.asarray(prompts[idx]),
                self.cfg,
                compute_dtype=self.compute_dtype,
                max_tokens=self.max_tokens,
                suppress_ids=suppress,
                timestamps=self.timestamps,
                apply_filters=self.apply_filters,
                self_kv_quant=self.self_kv_quant,
                temperature=temp,
                seed=int(temp * 1000),
                sot_index=sot_index,
            )
            tokens = np.asarray(result.tokens)
            lengths = np.asarray(result.lengths)
            avg_lp = np.asarray(result.avg_logprob)
            tokens[idx] = np.asarray(sub.tokens)
            lengths[idx] = np.asarray(sub.lengths)
            avg_lp[idx] = np.asarray(sub.avg_logprob)
            from .decode import GreedyResult

            result = GreedyResult(
                tokens=jnp.asarray(tokens), lengths=jnp.asarray(lengths),
                no_speech_prob=result.no_speech_prob,
                avg_logprob=jnp.asarray(avg_lp))
        return result

    def transcribe(
        self,
        audio: Union[str, bytes, np.ndarray],
        language: Optional[str] = None,
    ) -> TranscribeResult:
        return self.transcribe_batch([audio], language=language)[0]

    def transcribe_longform(
        self,
        audios: Sequence[Union[str, bytes, np.ndarray]],
        language: Optional[str] = None,
    ) -> List[TranscribeResult]:
        """Seek-based long-form: timestamp-conditioned sliding windows
        (OpenAI-canonical), batched across utterances. The default
        transcribe_batch uses fixed windows instead; this strategy tracks
        segment boundaries so windows never cut words."""
        if self.draft_params is not None:
            # the seek path decodes with the timestamp grammar (sequential
            # rule state the verify window cannot replay) — failing loudly
            # beats silently decoding without the draft the caller asked for
            raise ValueError(
                "speculative decoding is not supported on the seek-based "
                "longform path; use transcribe/transcribe_batch (fixed "
                "windows) with spec_draft")
        from .longform import transcribe_seek

        t0 = time.perf_counter()
        language = language or self.language or "en"
        waves = [load_audio(a) for a in audios]
        results = transcribe_seek(self, waves, language)
        wall = time.perf_counter() - t0
        return [
            TranscribeResult(
                text=text,
                language=language,
                tokens=np.zeros((0,), np.int32),
                audio_seconds=len(w) / 16000.0,
                wall_seconds=wall / len(audios),
                segments_list=segs,
            )
            for (text, segs), w in zip(results, waves)
        ]

    # convenience alias matching the reference's ``Whisper.run``
    def run(self, audio: Union[str, np.ndarray]) -> str:
        return self.transcribe(audio).text
