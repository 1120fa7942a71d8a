"""Mel frontend golden tests: TPU matmul-DFT path vs float64 numpy oracle,
and the oracle vs reference constants."""

import numpy as np
import pytest

from godot_whisper_tpu.audio import mel as melmod
from godot_whisper_tpu.audio.mel import (MelFrontend, frame_counts,
                                         hann_window, log_mel_np,
                                         mel_filterbank, pad_audio)


@pytest.fixture(scope="module")
def filters(stub_tiny_en):
    return stub_tiny_en.mel_filters  # real 80x201 whisper filters


def test_hann_periodic():
    w = hann_window(400)
    assert w[0] == 0.0
    # periodic window: w[200] is the peak value 1.0
    assert abs(w[200] - 1.0) < 1e-6
    # and NOT symmetric endpoint (w[399] != 0)
    assert w[399] > 0


def test_pad_lengths():
    x = np.zeros(16000, dtype=np.float32)
    p = pad_audio(x)
    assert len(p) == 16000 + 480000 + 400
    n_len, n_len_org = frame_counts(16000)
    assert n_len == (len(p) - 400) // 160
    assert n_len_org == 1 + (16000 + 200 - 400) // 160


def test_reflect_padding():
    x = np.arange(1, 1000, dtype=np.float32)
    p = pad_audio(x)
    # head is x[1:201] reversed (whisper.cpp:2827)
    np.testing.assert_array_equal(p[:200], x[1:201][::-1])
    np.testing.assert_array_equal(p[200:200 + len(x)], x)


def test_filterbank_matches_checkpoint(filters):
    """Our Slaney filterbank reproduces the filters baked into real
    checkpoints (they came from librosa)."""
    ours = mel_filterbank(80)
    assert ours.shape == filters.shape
    np.testing.assert_allclose(ours, filters, atol=2e-4)


def test_jax_mel_matches_oracle(filters, rng):
    x = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    # add structure: a 440 Hz tone
    t = np.arange(32000) / 16000.0
    x += 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)

    oracle = log_mel_np(x, filters)
    fe = MelFrontend(filters)
    got = fe(x)
    assert got.shape == oracle.shape
    # f32 DFT vs f64 oracle: tight everywhere except log10 near spectral
    # nulls (the reference's own f32 FFT has the same drift vs f64).
    diff = np.abs(got - oracle)
    assert diff.mean() < 1e-3
    assert np.quantile(diff, 0.999) < 5e-3
    assert diff.max() < 0.05


def test_jfk_mel(jfk_audio, filters):
    fe = MelFrontend(filters)
    mel = fe(jfk_audio)
    n_len, n_len_org = frame_counts(len(jfk_audio))
    assert mel.shape == (80, n_len)
    # normalized range: (x+4)/4 with x in [max-8, max], so span <= 2
    assert mel.max() - mel.min() <= 2.0 + 1e-5
    # speech content should produce variation in the valid region
    assert mel[:, :n_len_org].std() > 0.05


def test_silence_mel(filters):
    x = np.zeros(16000, dtype=np.float32)
    oracle = log_mel_np(x, filters)
    fe = MelFrontend(filters)
    got = fe(x)
    np.testing.assert_allclose(got, oracle, atol=5e-3)
    # all-silence: every value is log10(1e-10) -> normalized (-10+4)/4 = -1.5
    assert abs(float(got[0, 0]) - (-1.5)) < 1e-4


def test_pallas_mel_kernel_matches_jnp(filters, rng, monkeypatch):
    """Fused Pallas kernel (interpret mode) == jnp DFT-as-matmul path ==
    f64 oracle, single and batched."""
    monkeypatch.setenv("GWT_PALLAS_INTERPRET", "1")
    from godot_whisper_tpu.ops import mel_kernel
    t = np.arange(24000) / 16000.0
    clips = [
        (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32),
        (0.2 * np.sin(2 * np.pi * 220 * t[:19000])).astype(np.float32),
    ]
    fe = MelFrontend(filters)
    try:
        # single-clip device path routes through the kernel under interpret
        got, n_len = fe.device(clips[0])
        got = np.asarray(got)[:, :n_len]
        oracle = log_mel_np(clips[0], filters)
        assert got.shape == oracle.shape
        diff = np.abs(got - oracle)
        assert diff.mean() < 1e-3 and diff.max() < 0.05

        # batched path: per-clip normalization, ragged lengths
        mel_b, n_lens = fe.device_batch(clips)
        mel_b = np.asarray(mel_b)
        for i, clip in enumerate(clips):
            oracle_i = log_mel_np(clip, filters)
            got_i = mel_b[i, :, :n_lens[i]]
            diff = np.abs(got_i - oracle_i[:, :n_lens[i]])
            assert diff.mean() < 1e-3 and diff.max() < 0.05
    finally:
        mel_kernel._log_mel_pallas.clear_cache()


def test_log_mel_host_matches_oracle(rng):
    """The fast vectorized host mel equals the f64 oracle (f32 tol)."""
    from godot_whisper_tpu.audio.mel import (log_mel_host, log_mel_np,
                                             mel_filterbank)
    audio = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
    filt = mel_filterbank(80)
    want = log_mel_np(audio, filt)
    got = log_mel_host(audio, filt)
    assert got.shape[1] >= want.shape[1]
    np.testing.assert_allclose(got[:, :want.shape[1]], want,
                               atol=1e-4, rtol=1e-4)


def test_host_mel_frontend_path(monkeypatch):
    """MelFrontend with GWT_HOST_MEL=1 produces the same device mel (and
    shapes) as the device-compute path."""
    from godot_whisper_tpu.audio.mel import MelFrontend, mel_filterbank
    # local rng: the session fixture's stream position depends on test
    # order, and this comparison's tolerance is input-sensitive
    rng = np.random.default_rng(77)
    audio = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    filt = mel_filterbank(80)
    fe = MelFrontend(filt)
    MelFrontend._host_mel.cache_clear()
    monkeypatch.setenv("GWT_HOST_MEL", "0")
    dev, n_dev = fe.device(audio)
    bdev, bl_dev = fe.device_batch([audio, audio * 0.5])
    MelFrontend._host_mel.cache_clear()
    monkeypatch.setenv("GWT_HOST_MEL", "1")
    host, n_host = fe.device(audio)
    bhost, bl_host = fe.device_batch([audio, audio * 0.5])
    MelFrontend._host_mel.cache_clear()
    assert host.shape == dev.shape and n_host == n_dev
    assert bhost.shape == bdev.shape and bl_host == bl_dev
    np.testing.assert_allclose(np.asarray(host)[:, :n_dev],
                               np.asarray(dev)[:, :n_dev],
                               atol=3e-3, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(bhost)[:, :, :bl_dev[0]],
                               np.asarray(bdev)[:, :, :bl_dev[0]],
                               atol=3e-3, rtol=3e-3)


def test_mel_wire_int8(monkeypatch):
    """GWT_MEL_WIRE=int8: uint8 wire mel decodes to within one
    quantization step of the f16 path."""
    from godot_whisper_tpu.audio.mel import MelFrontend, mel_filterbank
    rng = np.random.default_rng(88)
    audio = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    clips = [audio, audio * 0.3]
    fe = MelFrontend(mel_filterbank(80))

    MelFrontend._host_mel.cache_clear()
    monkeypatch.setenv("GWT_HOST_MEL", "1")
    ref, nl = fe.device_batch(clips)
    monkeypatch.setenv("GWT_MEL_WIRE", "int8")
    got, nl2 = fe.device_batch(clips)
    MelFrontend._host_mel.cache_clear()
    assert got.shape == ref.shape and nl == nl2
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 2.0 / 255 + 1e-3
