"""Native C++ audio frontend vs NumPy twins."""

import numpy as np
import pytest

from godot_whisper_tpu.native import bindings

pytestmark = pytest.mark.skipif(not bindings.available(),
                                reason="native toolchain unavailable")


def test_ring_buffer():
    ring = bindings.NativeRing(1024)
    x = np.arange(100, dtype=np.float32)
    assert ring.push(x) == 100
    assert ring.available == 100
    out = ring.pop(60)
    np.testing.assert_array_equal(out, x[:60])
    assert ring.available == 40
    # overflow drops
    big = np.ones(2000, dtype=np.float32)
    pushed = ring.push(big)
    assert pushed == 1024 - 40


def test_native_resample_matches_python():
    from godot_whisper_tpu.audio.resample import Interpolator, resample
    rng = np.random.default_rng(0)
    t = np.arange(48000) / 48000.0
    x = (np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
    got = bindings.native_resample(x, 48000, 16000, taps_per_phase=16)
    want = resample(x, 48000, 16000, Interpolator.SINC_FASTEST)
    n = min(len(got), len(want))
    # identical polyphase math; tolerance covers float summation order
    np.testing.assert_allclose(got[8:n - 8], want[8:n - 8], atol=1e-3)


def test_native_vad_matches_python():
    from godot_whisper_tpu.audio.vad import vad_simple
    rng = np.random.default_rng(1)
    cases = [
        (0.5 * rng.standard_normal(3 * 16000)).astype(np.float32),
        np.concatenate([5e-5 * rng.standard_normal(32000),
                        np.zeros(16000)]).astype(np.float32),
        np.zeros(100, dtype=np.float32),
    ]
    for x in cases:
        assert bindings.native_vad_simple(x.copy()) == vad_simple(x.copy())


def test_native_energy_matches_python():
    from godot_whisper_tpu.decode.timestamps import signal_energy
    rng = np.random.default_rng(2)
    x = rng.standard_normal(5000).astype(np.float32)
    got = bindings.native_signal_energy(x, 32)
    want = signal_energy(x, 32)
    np.testing.assert_allclose(got, want, atol=1e-5)
