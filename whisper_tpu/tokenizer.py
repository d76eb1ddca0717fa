"""Whisper tokenizer (tiktoken BPE) for the TPU stack.

Capability parity with the reference's python/whisper_tokenizer.py (itself a
copy of OpenAI Whisper's public tokenizer): 99/100-language table, special
tokens, sot-sequence construction, timestamp decode, non-speech token set,
and word splitting for languages without spaces.

The BPE rank table (``multilingual.tiktoken``/``gpt2.tiktoken``) is OpenAI's
public vocab asset (MIT), vendored in ``assets/`` so the framework stands
alone; :func:`find_vocab_file` also honors ``WHISPER_TPU_VOCAB``.
"""

from __future__ import annotations

import base64
import os
import string
from dataclasses import dataclass
from functools import cached_property, lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import tiktoken

# Public OpenAI Whisper language table (order defines token ids:
# <|en|> = sot+1, ... ; reference copy at python/whisper_tokenizer.py:10-111).
LANGUAGES = {
    "en": "english", "zh": "chinese", "de": "german", "es": "spanish",
    "ru": "russian", "ko": "korean", "fr": "french", "ja": "japanese",
    "pt": "portuguese", "tr": "turkish", "pl": "polish", "ca": "catalan",
    "nl": "dutch", "ar": "arabic", "sv": "swedish", "it": "italian",
    "id": "indonesian", "hi": "hindi", "fi": "finnish", "vi": "vietnamese",
    "he": "hebrew", "uk": "ukrainian", "el": "greek", "ms": "malay",
    "cs": "czech", "ro": "romanian", "da": "danish", "hu": "hungarian",
    "ta": "tamil", "no": "norwegian", "th": "thai", "ur": "urdu",
    "hr": "croatian", "bg": "bulgarian", "lt": "lithuanian", "la": "latin",
    "mi": "maori", "ml": "malayalam", "cy": "welsh", "sk": "slovak",
    "te": "telugu", "fa": "persian", "lv": "latvian", "bn": "bengali",
    "sr": "serbian", "az": "azerbaijani", "sl": "slovenian", "kn": "kannada",
    "et": "estonian", "mk": "macedonian", "br": "breton", "eu": "basque",
    "is": "icelandic", "hy": "armenian", "ne": "nepali", "mn": "mongolian",
    "bs": "bosnian", "kk": "kazakh", "sq": "albanian", "sw": "swahili",
    "gl": "galician", "mr": "marathi", "pa": "punjabi", "si": "sinhala",
    "km": "khmer", "sn": "shona", "yo": "yoruba", "so": "somali",
    "af": "afrikaans", "oc": "occitan", "ka": "georgian", "be": "belarusian",
    "tg": "tajik", "sd": "sindhi", "gu": "gujarati", "am": "amharic",
    "yi": "yiddish", "lo": "lao", "uz": "uzbek", "fo": "faroese",
    "ht": "haitian creole", "ps": "pashto", "tk": "turkmen", "nn": "nynorsk",
    "mt": "maltese", "sa": "sanskrit", "lb": "luxembourgish", "my": "myanmar",
    "bo": "tibetan", "tl": "tagalog", "mg": "malagasy", "as": "assamese",
    "tt": "tatar", "haw": "hawaiian", "ln": "lingala", "ha": "hausa",
    "ba": "bashkir", "jw": "javanese", "su": "sundanese", "yue": "cantonese",
}

TO_LANGUAGE_CODE = {name: code for code, name in LANGUAGES.items()}
TO_LANGUAGE_CODE.update(
    burmese="my", valencian="ca", flemish="nl", haitian="ht", letzeburgesch="lb",
    pushto="ps", panjabi="pa", moldavian="ro", moldovan="ro", sinhalese="si",
    castilian="es", mandarin="zh",
)

# GPT-2 byte-level BPE split pattern (public).
_GPT2_PAT = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)

def _vocab_search_paths(name: str):
    return (
        os.path.join(os.path.dirname(__file__), "..", "assets", name),
        os.path.join(os.path.dirname(__file__), "assets", name),
    )


def find_vocab_file(explicit: Optional[str] = None,
                    multilingual: bool = True) -> str:
    """Locate the BPE rank table (multilingual.tiktoken, or gpt2.tiktoken
    for the English-only .en models)."""
    name = "multilingual.tiktoken" if multilingual else "gpt2.tiktoken"
    candidates = [explicit, os.environ.get("WHISPER_TPU_VOCAB")] + list(
        _vocab_search_paths(name))
    for c in candidates:
        if c and os.path.exists(c):
            return os.path.abspath(c)
    if multilingual:
        # vendored in assets/ — missing means a broken install, not egress
        raise FileNotFoundError(
            f"{name} vocab not found (it ships vendored in assets/ — this "
            "install is incomplete); set WHISPER_TPU_VOCAB to a copy of "
            "OpenAI's multilingual.tiktoken or reinstall the package")
    # English-only .en models ARE supported, but their GPT-2 rank table is
    # not vendored (it has never been fetched into this environment); the
    # fetch script covers it the day egress is available.
    raise FileNotFoundError(
        "gpt2.tiktoken vocab not found: English-only '.en' models are "
        "supported but their BPE table is not vendored yet. Fetch it with "
        "`python scripts/fetch_assets.py` (needs network egress) or point "
        "WHISPER_TPU_VOCAB at an existing gpt2.tiktoken "
        "(base64-token<space>rank lines, ggml-style)")


@lru_cache(maxsize=4)
def _load_ranks(path: str) -> Dict[bytes, int]:
    ranks = {}
    with open(path, "rb") as f:
        for line in f:
            if not line.strip():
                continue
            tok, rank = line.split()
            ranks[base64.b64decode(tok)] = int(rank)
    return ranks


@lru_cache(maxsize=8)
def get_encoding(vocab_path: str, num_languages: int = 99) -> tiktoken.Encoding:
    """Build the tiktoken Encoding. For .en models pass the gpt2 vocab and
    num_languages=0 (no language tokens; same special layout otherwise)."""
    ranks = _load_ranks(vocab_path)
    n_vocab = len(ranks)
    specials = ["<|endoftext|>", "<|startoftranscript|>"]
    specials += [f"<|{code}|>" for code in list(LANGUAGES.keys())[:num_languages]]
    specials += ["<|translate|>", "<|transcribe|>", "<|startoflm|>",
                 "<|startofprev|>", "<|nospeech|>", "<|notimestamps|>"]
    specials += [f"<|{i * 0.02:.2f}|>" for i in range(1501)]
    special_tokens = {}
    for tok in specials:
        special_tokens[tok] = n_vocab
        n_vocab += 1
    return tiktoken.Encoding(
        name=os.path.basename(vocab_path),
        explicit_n_vocab=n_vocab,
        pat_str=_GPT2_PAT,
        mergeable_ranks=ranks,
        special_tokens=special_tokens,
    )


@dataclass
class Tokenizer:
    """Whisper tokenizer with task/language context.

    Mirrors the behavioral surface of the reference tokenizer dataclass
    (python/whisper_tokenizer.py:131-327).
    """

    encoding: tiktoken.Encoding
    num_languages: int = 99
    language: Optional[str] = None
    task: Optional[str] = None

    def encode(self, text: str, **kw) -> List[int]:
        return self.encoding.encode(text, **kw)

    def decode(self, token_ids: Sequence[int], **kw) -> str:
        ids = [int(t) for t in token_ids if int(t) < self.timestamp_begin]
        return self.encoding.decode(ids, **kw)

    def decode_with_timestamps(self, token_ids: Sequence[int], **kw) -> str:
        parts: List[str] = []
        run: List[int] = []
        for t in token_ids:
            t = int(t)
            if t >= self.timestamp_begin:
                if run:
                    parts.append(self.encoding.decode(run, **kw))
                    run = []
                parts.append(f"<|{(t - self.timestamp_begin) * 0.02:.2f}|>")
            else:
                run.append(t)
        if run:
            parts.append(self.encoding.decode(run, **kw))
        return "".join(parts)

    # ---- special-token accessors ----
    @cached_property
    def eot(self) -> int:
        return self.encoding.encode_single_token("<|endoftext|>")

    @cached_property
    def sot(self) -> int:
        return self.encoding.encode_single_token("<|startoftranscript|>")

    @cached_property
    def transcribe(self) -> int:
        return self.encoding.encode_single_token("<|transcribe|>")

    @cached_property
    def translate(self) -> int:
        return self.encoding.encode_single_token("<|translate|>")

    @cached_property
    def sot_lm(self) -> int:
        return self.encoding.encode_single_token("<|startoflm|>")

    @cached_property
    def sot_prev(self) -> int:
        return self.encoding.encode_single_token("<|startofprev|>")

    @cached_property
    def no_speech(self) -> int:
        return self.encoding.encode_single_token("<|nospeech|>")

    @cached_property
    def no_timestamps(self) -> int:
        return self.encoding.encode_single_token("<|notimestamps|>")

    @cached_property
    def timestamp_begin(self) -> int:
        return self.encoding.encode_single_token("<|0.00|>")

    @cached_property
    def language_token(self) -> int:
        if self.language is None:
            raise ValueError("tokenizer has no language set")
        return self.to_language_token(self.language)

    def to_language_token(self, language: str) -> int:
        return self.encoding.encode_single_token(f"<|{language}|>")

    @cached_property
    def all_language_tokens(self) -> Tuple[int, ...]:
        return tuple(
            self.to_language_token(code)
            for code in list(LANGUAGES.keys())[: self.num_languages]
        )

    @cached_property
    def all_language_codes(self) -> Tuple[str, ...]:
        return tuple(list(LANGUAGES.keys())[: self.num_languages])

    @cached_property
    def sot_sequence(self) -> Tuple[int, ...]:
        seq = [self.sot]
        if self.language is not None:
            seq.append(self.language_token)
        if self.task is not None:
            seq.append(self.transcribe if self.task == "transcribe" else self.translate)
        return tuple(seq)

    @cached_property
    def sot_sequence_including_notimestamps(self) -> Tuple[int, ...]:
        return tuple(list(self.sot_sequence) + [self.no_timestamps])

    @cached_property
    def non_speech_tokens(self) -> Tuple[int, ...]:
        """Token ids to suppress so decoding never emits bracketed/markup
        non-speech annotations (♪♪, ((, 「 ...).

        Symbol inventory is OpenAI Whisper's public list (MIT); a symbol is
        suppressed in both bare and space-prefixed form when it maps to a
        single token, and musical notes are suppressed by their first token
        even when multi-token.
        """
        single_chars = '"#()*+/:;<=>@[\\]^_`{|}~「」『』'
        multi_chars = (
            "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪"
        ).split()
        notes = "♩♪♫♬♭♮♯"
        ids = {self.encode(" -")[0], self.encode(" '")[0]}
        for sym in [*single_chars, *multi_chars, *notes]:
            for variant in (sym, " " + sym):
                toks = self.encode(variant)
                if len(toks) == 1 or sym in notes:
                    ids.add(toks[0])
        return tuple(sorted(ids))

    # ---- word splitting ----------------------------------------------
    # Algorithm follows OpenAI Whisper's tokenizer (MIT license); the
    # implementation below is this repo's own. Reference carries the same
    # upstream code at python/whisper_tokenizer.py:286-327.

    def split_to_word_tokens(self, tokens: Sequence[int]):
        if self.language in {"zh", "ja", "th", "lo", "my", "yue"}:
            # scripts without inter-word whitespace: every complete
            # codepoint run is its own "word"
            return self.split_tokens_on_unicode(tokens)
        return self.split_tokens_on_spaces(tokens)

    def split_tokens_on_unicode(self, tokens: Sequence[int]):
        """Group tokens into minimal runs that decode to whole codepoints.

        Byte-level BPE can split a multi-byte UTF-8 character across tokens;
        a run is complete once its decode contains no U+FFFD replacement
        char — unless the full text genuinely has U+FFFD at that offset.
        """
        full_text = self.decode_with_timestamps(tokens)
        bad = "�"
        words: List[str] = []
        groups: List[List[int]] = []
        pending: List[int] = []
        done_len = 0
        for tok in map(int, tokens):
            pending.append(tok)
            text = self.decode_with_timestamps(pending)
            i = text.find(bad)
            incomplete = i >= 0 and full_text[done_len + i] != bad
            if not incomplete:
                words.append(text)
                groups.append(pending)
                pending = []
                done_len += len(text)
        return words, groups

    def split_tokens_on_spaces(self, tokens: Sequence[int]):
        """Merge codepoint runs into space-delimited words (spaced scripts)."""
        words: List[str] = []
        groups: List[List[int]] = []
        for piece, toks in zip(*self.split_tokens_on_unicode(tokens)):
            begins_word = (
                not words
                or toks[0] >= self.eot  # special tokens stand alone
                or piece.startswith(" ")
                or piece.strip() in string.punctuation
            )
            if begins_word:
                words.append(piece)
                groups.append(list(toks))
            else:
                words[-1] += piece
                groups[-1] += toks
        return words, groups


def get_tokenizer(
    multilingual: bool = True,
    *,
    num_languages: int = 99,
    language: Optional[str] = None,
    task: Optional[str] = None,
    vocab_path: Optional[str] = None,
) -> Tokenizer:
    if language is not None:
        language = language.lower()
        if language not in LANGUAGES:
            if language in TO_LANGUAGE_CODE:
                language = TO_LANGUAGE_CODE[language]
            else:
                raise ValueError(f"unsupported language: {language}")
    if not multilingual:
        task = None
        language = None
    enc = get_encoding(find_vocab_file(vocab_path, multilingual), num_languages)
    return Tokenizer(encoding=enc, num_languages=num_languages, language=language, task=task)


def load_id2token(tokens_txt: str) -> Dict[int, bytes]:
    """Load a reference-format ``{name}-tokens.txt`` (base64-token␣id lines).

    Offline fallback decode path, format per python/whisper.py:118-124.
    """
    out: Dict[int, bytes] = {}
    with open(tokens_txt, "r") as f:
        for line in f:
            if not line.strip():
                continue
            tok, idx = line.split()
            out[int(idx)] = base64.b64decode(tok)
    return out
