"""Sharding correctness on the 8-virtual-device CPU mesh (SURVEY.md §4's
"fake backend" strategy): TP/DP-sharded execution must produce the same
numbers as single-device execution, proving the partition specs don't
change semantics (XLA inserts the collectives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_tpu.config import WhisperConfig
from whisper_tpu.decode import greedy_decode
from whisper_tpu.models.model import init_params
from whisper_tpu.parallel.sharding import (
    DATA_AXIS, MODEL_AXIS, data_specs, make_mesh, param_specs, shard_params,
)

NANO = WhisperConfig(
    name="nano-shard",
    n_mels=80,
    n_audio_ctx=32,
    n_audio_state=64,
    n_audio_head=4,   # divisible by model axis
    n_audio_layer=2,
    n_vocab=1024,
    n_text_ctx=16,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def setup():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    params = init_params(NANO, jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, NANO.n_mels, 64)).astype(np.float32))
    prompt = jnp.tile(jnp.asarray([[5, 6, 7, 8]], jnp.int32), (4, 1))
    ref = greedy_decode(params, mel, prompt, NANO, max_tokens=8)
    return params, mel, prompt, np.asarray(ref.tokens)


@pytest.mark.parametrize("n_data,n_model", [(4, 2), (2, 4), (4, 1), (1, 2)])
def test_sharded_decode_matches_unsharded(setup, n_data, n_model):
    params, mel, prompt, ref_tokens = setup
    mesh = make_mesh(n_data, n_model, devices=jax.devices()[: n_data * n_model])
    sp = shard_params(params, mesh, NANO)
    ds = data_specs()
    mel_s = jax.device_put(mel, NamedSharding(mesh, ds["mel"]))
    prompt_s = jax.device_put(prompt, NamedSharding(mesh, ds["tokens"]))
    res = greedy_decode(sp, mel_s, prompt_s, NANO, max_tokens=8)
    np.testing.assert_array_equal(np.asarray(res.tokens), ref_tokens)


def test_param_specs_cover_tree():
    """Every param leaf has a spec (tree structures match)."""
    params = init_params(NANO)
    specs = param_specs(NANO)
    jax.tree.map(lambda a, b: None, params, specs)  # raises on mismatch


def test_sharded_beam_matches(setup):
    from whisper_tpu.beam import beam_search

    params, mel, prompt, _ = setup
    ref = beam_search(params, mel, prompt, NANO, beam_size=2,
                      apply_filters=False, max_tokens=6)
    mesh = make_mesh(4, 2)
    sp = shard_params(params, mesh, NANO)
    ds = data_specs()
    mel_s = jax.device_put(mel, NamedSharding(mesh, ds["mel"]))
    prompt_s = jax.device_put(prompt, NamedSharding(mesh, ds["tokens"]))
    res = beam_search(sp, mel_s, prompt_s, NANO, beam_size=2,
                      apply_filters=False, max_tokens=6)
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref.tokens))
