"""Batched multi-stream transcription tests."""

import numpy as np
import pytest

import godot_whisper_tpu as gwt
from godot_whisper_tpu.parallel.batch import BatchTranscriber


@pytest.fixture(scope="module")
def nano_ctx():
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    return gwt.WhisperContext(pipe)


def _clip(rng, seconds, freq):
    t = np.arange(int(seconds * 16000)) / 16000.0
    return (0.3 * np.sin(2 * np.pi * freq * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


def test_batch_three_streams(nano_ctx, rng):
    clips = [_clip(rng, 2.0, 220), _clip(rng, 3.0, 440),
             _clip(rng, 2.5, 330)]
    bt = BatchTranscriber(nano_ctx)
    results = bt.transcribe(
        clips, gwt.TranscribeParams(best_of=1, temperature_inc=0.0))
    assert len(results) == 3
    for segs in results:
        for s in segs:
            assert s.t1 >= s.t0 >= 0


def test_batch_matches_single_stream(nano_ctx, rng):
    """A batched greedy stream must produce the same text as full()."""
    clip = _clip(rng, 2.0, 220)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)

    single = nano_ctx.full(p, clip)
    single_text = "".join(s.text for s in single)

    bt = BatchTranscriber(nano_ctx)
    batched = bt.transcribe([clip, _clip(rng, 2.0, 550)], p)
    batch_text = "".join(s.text for s in batched[0])
    assert batch_text == single_text


def test_batch_short_clip_skipped(nano_ctx, rng):
    bt = BatchTranscriber(nano_ctx)
    results = bt.transcribe(
        [np.zeros(4000, dtype=np.float32), _clip(rng, 2.0, 220)],
        gwt.TranscribeParams(best_of=1, temperature_inc=0.0))
    assert results[0] == []
