"""Microphone capture sources (runtime/capture.py): producer thread ->
SPSC ring -> StreamingTranscriber pull, the reference's
AudioEffectCapture / SDL capture analogue (VERDICT r4 ask #6)."""

import time

import numpy as np
import pytest

import godot_whisper_tpu as gwt
from godot_whisper_tpu.runtime.capture import CaptureSource, _PyRing


def test_synthetic_producer_thread_through_ring():
    """A paced producer THREAD fills the ring while the consumer drains
    it — the exact threading shape of the capture path."""
    src = CaptureSource("synthetic", ring_seconds=5.0)
    backend = src.start()
    assert backend == "synthetic"
    got = []
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 0.7:
        time.sleep(0.1)
        got.append(src.read_available())
    src.stop()
    total = sum(len(g) for g in got)
    # paced at real time: ~0.7 s of 16 kHz audio, generous tolerance
    assert 0.3 * 16000 <= total <= 1.5 * 16000, total
    wave = np.concatenate(got)
    assert np.abs(wave).max() > 0.05         # actual signal, not zeros
    assert src.dropped == 0


def test_ring_overflow_drops_like_audio_effect_capture():
    """Overflow DROPS samples (AudioEffectCapture semantics,
    capture_stream_to_text.gd) instead of blocking the audio thread."""
    src = CaptureSource("synthetic", ring_seconds=0.01)  # 160-sample ring
    src._start_synthetic = lambda: None                  # no thread
    src.start()
    src._push(np.ones(100, np.float32))
    src._push(np.ones(100, np.float32))                  # 40 must drop
    assert src.dropped == 40
    assert len(src.read_available()) == 160
    src.stop()


def test_pyring_matches_native_contract():
    ring = _PyRing(8)
    assert ring.push(np.arange(5, dtype=np.float32)) == 5
    assert ring.push(np.arange(5, dtype=np.float32)) == 3  # drop 2
    assert ring.available == 8
    out = ring.pop(4)
    np.testing.assert_array_equal(out, [0, 1, 2, 3])
    assert ring.push(np.full(4, 9, np.float32)) == 4
    np.testing.assert_array_equal(
        ring.pop(8), [4, 0, 1, 2, 9, 9, 9, 9])


def test_native_ring_same_contract():
    from godot_whisper_tpu.native.bindings import available
    if not available():
        pytest.skip("native library unavailable")
    from godot_whisper_tpu.native.bindings import NativeRing
    ring = NativeRing(8)
    assert ring.push(np.arange(5, dtype=np.float32)) == 5
    assert ring.push(np.arange(5, dtype=np.float32)) == 3
    assert ring.available == 8
    np.testing.assert_array_equal(ring.pop(4), [0, 1, 2, 3])
    assert ring.push(np.full(4, 9, np.float32)) == 4
    np.testing.assert_array_equal(
        ring.pop(8), [4, 0, 1, 2, 9, 9, 9, 9])


def test_unavailable_backends_raise():
    # explicit hardware backend on a machine without it must fail loudly
    src = CaptureSource("sounddevice")
    with pytest.raises(RuntimeError):
        src.start()


def test_stream_cli_mic_synthetic(pico_ctx_path, capsys):
    """The full --mic path: synthetic capture device -> ring ->
    StreamingTranscriber -> transcript, through the real CLI."""
    from godot_whisper_tpu.cli.stream import main
    rc = main(["-m", pico_ctx_path, "--mic",
               "--capture-backend", "synthetic", "--duration", "0.8",
               "--step", "0.3"])
    assert rc == 0


@pytest.fixture(scope="module")
def pico_ctx_path(tmp_path_factory):
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import synthetic_vocab
    from godot_whisper_tpu.models import loader_ggml
    from godot_whisper_tpu.models.export_ggml import export_checkpoint
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64,
        n_audio_head=2, n_text_state=64, n_text_head=2, name="pico")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    path = str(tmp_path_factory.mktemp("models") / "pico.bin")
    export_checkpoint(path, params, cfg, mel_filterbank(80),
                      synthetic_vocab(cfg), ttype=loader_ggml.GGML_TYPE_F32)
    return path
