"""Streaming scheduler tests (mirrors CaptureStreamToText semantics)."""

import numpy as np
import pytest

import godot_whisper_tpu as gwt
from godot_whisper_tpu.runtime.streaming import (StreamingConfig,
                                                 StreamingTranscriber,
                                                 has_terminating_characters,
                                                 remove_special_characters)


def test_remove_special_characters():
    # audio_stream_to_text.gd:66-81 semantics
    assert remove_special_characters("hello [noise] world") == "hello  world"
    assert remove_special_characters("a <tag> b") == "a  b"
    assert remove_special_characters("la ♪music♪ la") == "la  la"
    # the reference's substr(end+1) eats the char AFTER the match too
    # (audio_stream_to_text.gd:79): "so. you. done" -> "sodone"
    assert remove_special_characters("so. you. done") == "sodone"


def test_has_terminating_characters():
    assert has_terminating_characters("Hello.", ".!?;。；？！")
    assert not has_terminating_characters("Hello", ".!?;。；？！")


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


def test_streaming_loop(nano_ctx, rng):
    events = []
    st = StreamingTranscriber(
        nano_ctx,
        StreamingConfig(use_dynamic_audio_context=True,
                        minimum_sentence_time=1.0),
        on_transcription=lambda partial, text: events.append((partial, text)),
        source_rate=16000)

    # feed 4 s of "speech" (noise) in 0.5 s chunks and process
    for _ in range(8):
        st.push_audio((0.2 * rng.standard_normal(8000)).astype(np.float32))
    report = st.process_once()
    assert report is not None
    assert report["no_activity"] is False  # noisy buffer: VAD says continue
    # dynamic audio_ctx formula total_time*1500/30 + 128 (gd:84), rounded
    # up to the compile bucket
    exact = int(4.0 * 1500 / 30 + 128)
    assert exact <= report["audio_ctx"] <= exact + 128
    assert len(events) == 1


def test_streaming_empty_buffer(nano_ctx):
    st = StreamingTranscriber(nano_ctx, StreamingConfig())
    assert st.process_once() is None


def test_streaming_resamples_other_rates(nano_ctx, rng):
    st = StreamingTranscriber(nano_ctx, StreamingConfig(
        minimum_sentence_time=0.5), source_rate=48000)
    st.push_audio((0.2 * rng.standard_normal(48000 * 2)).astype(np.float32))
    report = st.process_once()
    assert report is not None
    # 2 s at 48 kHz -> 2 s at 16 kHz (bucketed upward)
    exact = int(2.0 * 1500 / 30 + 128)
    assert exact <= report["audio_ctx"] <= exact + 128


def test_streaming_finalize_trims_buffer(nano_ctx):
    """Near-silence makes VAD fire no_activity; a quiet-but-voiced buffer
    with punctuation finalizes and keeps 0.2 s (gd:111-113)."""
    cfg = StreamingConfig(minimum_sentence_time=0.0,
                          maximum_sentence_time=1.5)
    st = StreamingTranscriber(nano_ctx, cfg)
    st.push_audio(np.full(2 * 16000, 0.1, dtype=np.float32))
    report = st.process_once()
    assert report is not None
    if not report["partial"]:
        assert len(st._buffer) <= int(0.2 * 16000) + 1


def test_incremental_mel_matches_oneshot(nano_ctx):
    """IncrementalMel fed in chunks == the one-shot mel of the whole
    clip, and each feed's work is O(delta) frames."""
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import frame_counts, log_mel_host
    from godot_whisper_tpu.runtime.streaming import IncrementalMel

    rng = np.random.default_rng(11)
    pipe = nano_ctx.pipeline
    audio = (0.2 * rng.standard_normal(16000 * 3)).astype(np.float32)

    inc = IncrementalMel(pipe)
    writes = []
    for i in range(0, len(audio), 4800):           # 0.3 s chunks
        writes.append(inc.feed(audio[i:i + 4800]))
    mel_inc, n_len, n_len_org = inc.normalized()

    # per-feed frame work is bounded by delta frames + 3-frame boundary
    assert max(writes[1:]) <= 4800 // 160 + 4
    assert n_len_org == frame_counts(len(audio))[1]

    want = log_mel_host(audio, pipe.mel.filters, n_frames=inc.cap)
    got = np.asarray(mel_inc)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_streaming_incremental_matches_full(nano_ctx, rng):
    """The incremental-mel scheduler path produces the same transcript
    as the re-mel-everything path."""
    audio = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)

    outs = {}
    for inc in (False, True):
        st = StreamingTranscriber(
            nano_ctx,
            StreamingConfig(minimum_sentence_time=0.5,
                            incremental_mel=inc),
            source_rate=16000)
        for i in range(0, len(audio), 8000):
            st.push_audio(audio[i:i + 8000])
            st.process_once()
        outs[inc] = st.text()
    assert outs[True] == outs[False]


def test_incremental_mel_tail_burst(nano_ctx):
    """A loud burst in the final <400 samples must drive the clip-global
    max-8 clamp exactly as the one-shot mel (the boundary frames count
    toward the max)."""
    from godot_whisper_tpu.audio.mel import log_mel_host
    from godot_whisper_tpu.runtime.streaming import IncrementalMel
    pipe = nano_ctx.pipeline
    audio = np.full(16000, 1e-4, np.float32)
    audio[-300:] = 0.9                      # burst at the very end
    inc = IncrementalMel(pipe)
    for i in range(0, len(audio), 4000):
        inc.feed(audio[i:i + 4000])
    mel_inc, n_len, _ = inc.normalized()
    want = log_mel_host(audio, pipe.mel.filters, n_frames=inc.cap)
    np.testing.assert_allclose(np.asarray(mel_inc), want,
                               atol=2e-5, rtol=2e-5)


def test_incremental_mel_short_first_feed(nano_ctx):
    """A first feed shorter than the 200-sample reflect head must not
    freeze a zero-padded head: the final mel equals the one-shot mel."""
    from godot_whisper_tpu.audio.mel import log_mel_host
    from godot_whisper_tpu.runtime.streaming import IncrementalMel
    rng = np.random.default_rng(13)
    pipe = nano_ctx.pipeline
    audio = (0.2 * rng.standard_normal(8000)).astype(np.float32)
    inc = IncrementalMel(pipe)
    inc.feed(audio[:160])                   # < 201 samples
    inc.feed(audio[160:500])
    inc.feed(audio[500:])
    mel_inc, _, _ = inc.normalized()
    want = log_mel_host(audio, pipe.mel.filters, n_frames=inc.cap)
    np.testing.assert_allclose(np.asarray(mel_inc), want,
                               atol=2e-5, rtol=2e-5)


def test_streaming_trim_resets_incremental(nano_ctx, rng):
    """After a sentence finalize trims the buffer, the incremental path
    must rebuild its mel even when the buffer regrows past its previous
    length — parity with the re-mel-everything path throughout."""
    audio = (0.2 * rng.standard_normal(16000 * 3)).astype(np.float32)
    outs = {}
    for inc in (False, True):
        st = StreamingTranscriber(
            nano_ctx,
            StreamingConfig(minimum_sentence_time=0.4,
                            maximum_sentence_time=0.8,  # force finalizes
                            keep_seconds=0.3,
                            incremental_mel=inc),
            source_rate=16000)
        for i in range(0, len(audio), 16000):
            st.push_audio(audio[i:i + 16000])
            st.process_once()
        outs[inc] = (st.text(), list(st.finalized_texts))
    assert outs[True] == outs[False]
