"""Whole-decode (generate-level) parity vs HuggingFace transformers.

test_model_parity.py proves per-layer/per-step numerics; these tests prove the
full compiled decode programs — greedy while_loop, beam-5 search, and the
timestamp grammar — are token-identical to
``WhisperForConditionalGeneration.generate`` running the same random weights.
This is the strongest correctness gate available offline: any pretrained
checkpoint then inherits generate-level parity (the reference's only analog
is its on-device WER run, python/test_wer.py:249-303).

The decoder positional embedding is scaled up so greedy outputs vary per
position (a plain random init argmaxes the same token every step, which would
make the comparison vacuous).
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # transformers-anchored parity: heavy setup, nightly tier

from whisper_tpu.config import WhisperConfig
from whisper_tpu.decode import greedy_decode
from whisper_tpu.models.checkpoint import from_hf_state_dict
from whisper_tpu.sampling import build_suppress_ids

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# real vocab (special-token ids are layout-derived), toy dims
CFG = WhisperConfig(
    name="gen-parity",
    n_mels=80,
    n_audio_ctx=48,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=64,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def torch_model():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=CFG.n_vocab,
        num_mel_bins=CFG.n_mels,
        encoder_layers=CFG.n_audio_layer,
        encoder_attention_heads=CFG.n_audio_head,
        decoder_layers=CFG.n_text_layer,
        decoder_attention_heads=CFG.n_text_head,
        d_model=CFG.n_audio_state,
        encoder_ffn_dim=4 * CFG.n_audio_state,
        decoder_ffn_dim=4 * CFG.n_text_state,
        max_source_positions=CFG.n_audio_ctx,
        max_target_positions=CFG.n_text_ctx,
        pad_token_id=CFG.eot,
        bos_token_id=CFG.eot,
        eos_token_id=CFG.eot,
        decoder_start_token_id=CFG.sot,
        suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    torch.manual_seed(11)
    m = transformers.WhisperForConditionalGeneration(hf_cfg)
    with torch.no_grad():
        m.model.decoder.embed_positions.weight.mul_(8.0)
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(torch_model):
    sd = {k: v.detach().float().numpy()
          for k, v in torch_model.model.state_dict().items()}
    return from_hf_state_dict(sd, CFG)


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(0)
    return (rng.standard_normal((2, CFG.n_mels, 2 * CFG.n_audio_ctx)) * 0.5
            ).astype(np.float32)


def _prompt(timestamps: bool = False):
    seq = CFG.sot_sequence("zh", "transcribe")
    if timestamps:
        seq = seq[:-1]  # drop <|notimestamps|>
    return np.tile(np.asarray(seq, np.int32), (2, 1))


def _check_rows(hf_new_tokens, our_tokens, prompt_len):
    """HF returns only the generated continuation; ours includes the prompt
    and pads with eot. Every HF row must be a prefix-exact match."""
    ours = np.asarray(our_tokens)
    for b in range(hf_new_tokens.shape[0]):
        row = hf_new_tokens[b]
        # HF pads finished rows with pad_token_id (= eot here), which matches
        # our eot padding, so a full-width comparison is exact
        np.testing.assert_array_equal(
            row, ours[b, prompt_len: prompt_len + len(row)],
            err_msg=f"row {b} diverged from transformers generate")


def test_greedy_generate_parity(torch_model, params, mel):
    prompt = _prompt()
    with torch.no_grad():
        hf = torch_model.generate(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(prompt.astype(np.int64)),
            max_new_tokens=12, do_sample=False, num_beams=1,
        ).numpy()
    res = greedy_decode(params, jnp.asarray(mel), jnp.asarray(prompt), CFG,
                        max_tokens=12)
    assert len(set(hf[0].tolist())) > 4, "degenerate decode; test is vacuous"
    _check_rows(hf, res.tokens, prompt.shape[1])


def test_beam5_generate_parity(torch_model, params, mel):
    from whisper_tpu.beam import beam_search

    prompt = _prompt()
    with torch.no_grad():
        hf = torch_model.generate(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(prompt.astype(np.int64)),
            max_new_tokens=12, do_sample=False, num_beams=5,
            length_penalty=1.0, early_stopping=True,
        ).numpy()
    res = beam_search(params, jnp.asarray(mel), jnp.asarray(prompt), CFG,
                      beam_size=5, apply_filters=False, max_tokens=12)
    assert not np.array_equal(hf[0], hf[1]) or len(set(hf[0].tolist())) > 4
    _check_rows(hf, res.tokens, prompt.shape[1])


def test_timestamp_grammar_generate_parity(torch_model, params, mel):
    """Our on-device timestamp grammar (sampling.apply_rules) must pick the
    same tokens as transformers' WhisperTimeStampLogitsProcessor."""
    prompt = _prompt(timestamps=True)
    suppress = build_suppress_ids(CFG)

    gen_cfg = transformers.GenerationConfig(
        max_new_tokens=20, do_sample=False, num_beams=1,
        pad_token_id=CFG.eot, bos_token_id=CFG.eot, eos_token_id=CFG.eot,
        decoder_start_token_id=CFG.sot,
    )
    gen_cfg.no_timestamps_token_id = CFG.no_timestamps
    gen_cfg.max_initial_timestamp_index = 50  # OpenAI default (1.0 s)
    gen_cfg.suppress_tokens = suppress.tolist()
    # matches our always-on first-token blank suppression (blank_id + eot)
    gen_cfg.begin_suppress_tokens = [CFG.blank_id, CFG.eot]
    proc = transformers.generation.logits_process.WhisperTimeStampLogitsProcessor(
        gen_cfg, begin_index=prompt.shape[1])

    with torch.no_grad():
        hf = torch_model.generate(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(prompt.astype(np.int64)),
            generation_config=gen_cfg,
            logits_processor=[proc],
        ).numpy()
    res = greedy_decode(params, jnp.asarray(mel), jnp.asarray(prompt), CFG,
                        max_tokens=20, suppress_ids=jnp.asarray(suppress),
                        timestamps=True, apply_filters=True)
    # the decode must actually exercise the grammar: timestamps present
    assert (hf[0] >= CFG.timestamp_begin).any()
    _check_rows(hf, res.tokens, prompt.shape[1])
