"""End-to-end pipeline under tensor-parallel sharding: the full() seek loop
with the in-jit window decoder must run (and match) with params sharded
over a ("dp","tp") mesh — the single-controller shape of large-v3 serving
(BASELINE config 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import godot_whisper_tpu as gwt
from godot_whisper_tpu.audio.mel import mel_filterbank
from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
from godot_whisper_tpu.decode.loop import WhisperPipeline
from godot_whisper_tpu.models.params import init_params
from godot_whisper_tpu.parallel.sharding import make_mesh, shard_params

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _build(params, cfg):
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    return gwt.WhisperContext(pipe)


def test_full_pipeline_tp_sharded(rng):
    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)

    audio = (0.3 * rng.standard_normal(3 * 16000)).astype(np.float32)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)

    ctx_plain = _build(params, cfg)
    plain = [s.text for s in ctx_plain.full(p, audio)]

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh, cfg)
    ctx_sh = _build(sharded, cfg)
    got = [s.text for s in ctx_sh.full(p, audio)]

    assert got == plain


def test_beam_pipeline_tp_sharded(rng):
    cfg = gwt.get_config("tiny").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano-multi")
    params = init_params(cfg, seed=1, compute_dtype=jnp.float32)
    audio = (0.3 * rng.standard_normal(2 * 16000)).astype(np.float32)
    p = gwt.beam_params(beam_size=2, best_of=2, temperature_inc=0.0,
                        language="en")

    ctx_plain = _build(params, cfg)
    plain = [s.text for s in ctx_plain.full(p, audio)]

    mesh = make_mesh(dp=1, tp=8)
    sharded = shard_params(params, mesh, cfg)
    ctx_sh = _build(sharded, cfg)
    got = [s.text for s in ctx_sh.full(p, audio)]
    assert got == plain
