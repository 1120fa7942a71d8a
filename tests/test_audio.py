"""Resampler, VAD and WAV IO tests."""

import numpy as np
import pytest

from godot_whisper_tpu.audio.resample import (Interpolator, mixdown,
                                              resample, resample_simple)
from godot_whisper_tpu.audio.vad import high_pass_filter, vad_simple
from godot_whisper_tpu.audio.wav import read_wav, write_wav


def _tone(freq, seconds, rate):
    t = np.arange(int(seconds * rate)) / rate
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


@pytest.mark.parametrize("src_rate", [44100, 48000, 22050, 8000])
def test_sinc_resample_tone(src_rate):
    """A 440 Hz tone must survive resampling to 16 kHz with the right
    length and dominant frequency."""
    x = _tone(440, 1.0, src_rate)
    y = resample(x, src_rate, 16000, Interpolator.SINC_MEDIUM)
    assert abs(len(y) - 16000) <= 2
    spec = np.abs(np.fft.rfft(y[200:-200] * np.hanning(len(y) - 400)))
    freq = np.fft.rfftfreq(len(y) - 400, 1 / 16000)[np.argmax(spec)]
    assert abs(freq - 440) < 5


def test_sinc_quality_tiers():
    x = _tone(1000, 0.5, 48000)
    ref = resample(x, 48000, 16000, Interpolator.SINC_BEST)
    for q in (Interpolator.SINC_MEDIUM, Interpolator.SINC_FASTEST):
        y = resample(x, 48000, 16000, q)
        n = min(len(ref), len(y))
        # mid-band tone: all tiers agree closely away from edges
        assert np.corrcoef(ref[500:n - 500], y[500:n - 500])[0, 1] > 0.99


def test_linear_and_zoh():
    x = _tone(100, 0.25, 48000)
    for interp in (Interpolator.LINEAR, Interpolator.ZERO_ORDER_HOLD):
        y = resample(x, 48000, 16000, interp)
        assert abs(len(y) - 4000) <= 2
        assert np.abs(y).max() <= 1.01


def test_same_rate_passthrough():
    x = _tone(440, 0.1, 16000)
    y = resample(x, 16000, 16000)
    np.testing.assert_array_equal(x, y)


def test_mixdown_stereo():
    buf = np.stack([np.ones(100), np.zeros(100)], axis=1).astype(np.float32)
    mono = mixdown(buf)
    np.testing.assert_allclose(mono, 0.5)


def test_resample_simple_glue():
    buf = np.stack([_tone(440, 0.2, 44100)] * 2, axis=1)
    y = resample_simple(buf, 44100, interpolator=2)
    assert abs(len(y) - int(0.2 * 16000)) <= 2


# ---------------------------------------------------------------------- VAD
def test_high_pass_matches_reference_loop():
    """Vectorized filter must equal the reference's recursive loop."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(5000).astype(np.float32)

    def ref_filter(data, cutoff, rate):
        rc = 1.0 / (2.0 * np.pi * cutoff)
        dt = 1.0 / rate
        alpha = dt / (rc + dt)
        out = data.copy()
        y = out[0]
        for i in range(1, len(out)):
            y = alpha * (y + out[i] - out[i - 1])
            out[i] = y
        return out

    got = high_pass_filter(x, 200.0, 16000)
    want = ref_filter(x.astype(np.float32), 200.0, 16000)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_vad_speech_continuing():
    """Energy in the tail -> speech has not ended."""
    rng = np.random.default_rng(1)
    x = (0.5 * rng.standard_normal(3 * 16000)).astype(np.float32)
    assert vad_simple(x, 16000, last_ms=500, vad_thold=0.3) is False


def test_vad_loud_head_not_ended():
    """Reference quirk (speech_to_text.cpp:100-103): 'ended' requires the
    WHOLE buffer near-silent, so a loud head keeps it False."""
    rng = np.random.default_rng(2)
    head = (0.5 * rng.standard_normal(2 * 16000)).astype(np.float32)
    tail = np.zeros(16000, dtype=np.float32)
    x = np.concatenate([head, tail])
    assert vad_simple(x, 16000, last_ms=500, vad_thold=0.3) is False


def test_vad_silence_ended():
    """Near-silent buffer with an even quieter tail -> ended."""
    rng = np.random.default_rng(3)
    head = (5e-5 * rng.standard_normal(2 * 16000)).astype(np.float32)
    tail = np.zeros(16000, dtype=np.float32)
    x = np.concatenate([head, tail])
    assert vad_simple(x, 16000, last_ms=500, vad_thold=0.3,
                      freq_thold=0.0) is True


def test_vad_too_short():
    assert vad_simple(np.zeros(100, dtype=np.float32), 16000,
                      last_ms=500) is False


# ---------------------------------------------------------------------- WAV
def test_wav_roundtrip(tmp_path):
    x = _tone(440, 0.25, 16000) * 0.5
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, rate = read_wav(p)
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_read_jfk(jfk_audio):
    assert len(jfk_audio) == pytest.approx(11 * 16000, rel=0.05)
    assert np.abs(jfk_audio).max() <= 1.0
