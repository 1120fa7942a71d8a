"""Fused filter+sample kernel vs the jnp reference stack."""

import numpy as np
import pytest

import jax.numpy as jnp

from godot_whisper_tpu.decode.filters import (FilterContext, process_logits,
                                              timestamp_stats)
from godot_whisper_tpu.models.config import get_config
from godot_whisper_tpu.ops.filter_sample import fused_filter_sample


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setenv("GWT_PALLAS_INTERPRET", "1")
    yield


def _mk_fctx(cfg):
    sup = np.zeros(cfg.n_vocab, bool)
    for t in (cfg.token_not, cfg.token_sot, cfg.token_nosp, cfg.token_solm,
              cfg.token_translate, cfg.token_transcribe, cfg.token_prev):
        sup[t] = True
    return sup, FilterContext(
        static_suppress=jnp.asarray(sup), token_eot=cfg.token_eot,
        token_beg=cfg.token_beg, space_id=220, max_initial_tid=50,
        n_vocab=cfg.n_vocab)


@pytest.mark.parametrize("seed", [0, 5])
def test_fused_matches_jnp_argmax(interpret_mode, seed):
    cfg = get_config("tiny.en")
    V = cfg.n_vocab
    rng = np.random.default_rng(seed)
    B = 3
    logits = jnp.asarray(rng.standard_normal((B, V)).astype(np.float32) * 3)
    sup, fctx = _mk_fctx(cfg)

    state = dict(
        is_initial=jnp.asarray([True, False, False]),
        last_token=jnp.asarray([-1, cfg.token_beg + 5, 123], jnp.int32),
        penult_token=jnp.asarray([-1, 77, cfg.token_beg + 3], jnp.int32),
        n_tokens=jnp.asarray([0, 5, 7], jnp.int32),
        has_ts=jnp.asarray([False, True, True]),
        seek_delta=jnp.asarray([3000, 10, 6], jnp.int32),
    )
    _, lp, probs = process_logits(
        logits, fctx=fctx, temperature=jnp.float32(0.0),
        suppress_blank=True, no_timestamps=False, **state)
    ids_ref = np.argmax(np.asarray(probs), axis=-1)
    pt_ref, ptsum_ref, tid_ref = timestamp_stats(probs, cfg.token_beg)

    out = fused_filter_sample(
        logits, jnp.asarray(sup), temperature=jnp.float32(0.0),
        seeds=jnp.zeros(B, jnp.int32), eot=cfg.token_eot,
        beg=cfg.token_beg, space_id=220, max_initial_tid=50,
        suppress_blank=True, no_timestamps=False, argmax_sample=True,
        **state)

    np.testing.assert_array_equal(np.asarray(out.token), ids_ref)
    np.testing.assert_allclose(
        np.asarray(out.p), np.asarray(probs)[np.arange(B), ids_ref],
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.plog), np.asarray(lp)[np.arange(B), ids_ref],
        atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.ptsum),
                               np.asarray(ptsum_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.tid),
                                  np.asarray(tid_ref))


def test_fused_window_decode_matches_unfused(interpret_mode, rng):
    """End-to-end window decode: fused kernel path == jnp path."""
    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_audio_head=2,
        n_text_state=64, n_text_head=2, name="pico")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    ctx = gwt.WhisperContext(pipe)
    audio = (0.2 * rng.standard_normal(2 * 16000)).astype(np.float32)

    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)
    fused_segs = ctx.full(p, audio)
    fused_text = [s.text for s in fused_segs]

    import os
    os.environ.pop("GWT_PALLAS_INTERPRET", None)
    ctx.pipeline._window_decoders.clear()
    plain_segs = ctx.full(p, audio)
    assert fused_text == [s.text for s in plain_segs]


def test_fused_large_batch_grid(interpret_mode):
    """B=20 spans multiple row-block grid programs (and pads the last):
    every row must match the jnp reference (a single-block kernel OOMs
    VMEM at B >= 16 on real hardware — the grid keeps blocks ~2 MB)."""
    cfg = get_config("tiny.en")
    V = cfg.n_vocab
    rng = np.random.default_rng(7)
    B = 20
    logits = jnp.asarray(rng.standard_normal((B, V)).astype(np.float32) * 3)
    sup, fctx = _mk_fctx(cfg)

    state = dict(
        is_initial=jnp.asarray(rng.integers(0, 2, B) == 1),
        last_token=jnp.asarray(rng.integers(-1, V, B), jnp.int32),
        penult_token=jnp.asarray(rng.integers(-1, V, B), jnp.int32),
        n_tokens=jnp.asarray(rng.integers(0, 9, B), jnp.int32),
        has_ts=jnp.asarray(rng.integers(0, 2, B) == 1),
        seek_delta=jnp.asarray(rng.integers(2, 3000, B), jnp.int32),
    )
    _, lp, probs = process_logits(
        logits, fctx=fctx, temperature=jnp.float32(0.0),
        suppress_blank=True, no_timestamps=False, **state)
    ids_ref = np.argmax(np.asarray(probs), axis=-1)

    out = fused_filter_sample(
        logits, jnp.asarray(sup), temperature=jnp.float32(0.0),
        seeds=jnp.zeros(B, jnp.int32), eot=cfg.token_eot,
        beg=cfg.token_beg, space_id=220, max_initial_tid=50,
        suppress_blank=True, no_timestamps=False, argmax_sample=True,
        **state)
    assert out.token.shape == (B,)
    np.testing.assert_array_equal(np.asarray(out.token), ids_ref)
    rows = np.arange(B)
    np.testing.assert_allclose(np.asarray(out.p),
                               np.asarray(probs)[rows, ids_ref], atol=1e-5)


def test_fused_topk_matches_jnp(interpret_mode):
    """Beam-expansion kernel: top-K plog/ids/p + ts stats must equal the
    jnp reference (process_logits + lax.top_k + timestamp_stats),
    including lowest-index tie order."""
    from jax import lax
    from godot_whisper_tpu.ops.filter_sample import fused_filter_topk

    cfg = get_config("tiny.en")
    V = cfg.n_vocab
    rng = np.random.default_rng(3)
    B, K = 10, 5
    logits = jnp.asarray(rng.standard_normal((B, V)).astype(np.float32) * 3)
    sup, fctx = _mk_fctx(cfg)
    state = dict(
        is_initial=jnp.asarray(rng.integers(0, 2, B) == 1),
        last_token=jnp.asarray(rng.integers(-1, V, B), jnp.int32),
        penult_token=jnp.asarray(rng.integers(-1, V, B), jnp.int32),
        n_tokens=jnp.asarray(rng.integers(0, 9, B), jnp.int32),
        has_ts=jnp.asarray(rng.integers(0, 2, B) == 1),
        seek_delta=jnp.asarray(rng.integers(2, 3000, B), jnp.int32),
    )
    _, lp, probs = process_logits(
        logits, fctx=fctx, temperature=jnp.float32(0.0),
        suppress_blank=True, no_timestamps=False, **state)
    ref_plog, ref_ids = lax.top_k(lp, K)
    pt_r, ptsum_r, tid_r = timestamp_stats(probs, cfg.token_beg)

    out = fused_filter_topk(
        logits, jnp.asarray(sup), K=K, temperature=jnp.float32(0.0),
        eot=cfg.token_eot, beg=cfg.token_beg, space_id=220,
        max_initial_tid=50, suppress_blank=True, no_timestamps=False,
        **state)
    np.testing.assert_array_equal(np.asarray(out.ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(out.plog), np.asarray(ref_plog),
                               atol=1e-4)
    rows = np.arange(B)[:, None]
    np.testing.assert_allclose(
        np.asarray(out.p), np.asarray(probs)[rows, np.asarray(ref_ids)],
        atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.ptsum), np.asarray(ptsum_r),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.tid), np.asarray(tid_r))


def test_fused_beam_window_matches_unfused(interpret_mode, rng):
    """End-to-end BEAM window decode: the fused top-K kernel path must
    produce the same segments as the jnp filter stack."""
    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_audio_head=2,
        n_text_state=64, n_text_head=2, name="pico")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    ctx = gwt.WhisperContext(pipe)
    t = np.arange(2 * 16000) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 280 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)

    p = gwt.TranscribeParams(
        strategy=gwt.SamplingStrategy.BEAM_SEARCH, beam_size=3, best_of=3,
        temperature_inc=0.0, entropy_thold=-1e9, logprob_thold=-1e9)
    fused_text = [s.text for s in ctx.full(p, audio)]

    import os
    os.environ.pop("GWT_PALLAS_INTERPRET", None)
    ctx.pipeline._window_decoders.clear()
    plain_text = [s.text for s in ctx.full(p, audio)]
    assert fused_text == plain_text and fused_text
