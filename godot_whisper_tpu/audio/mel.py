"""Log-mel spectrogram frontend.

Behavioral contract (must match for WER parity) mirrors
``log_mel_spectrogram`` in the reference
(/root/reference/thirdparty/whisper.cpp/whisper.cpp:2793-2887):

- reflective pad of N_FFT/2 = 200 samples at the front (samples[1..200]
  reversed), then 30 s of zeros + 400 at the end (whisper.cpp:2814-2827);
- periodic Hann window (whisper.cpp:2712-2725);
- per 10 ms frame: |FFT|^2 over bins 0..200, dot with the 80/128-mel
  filterbank, log10 with 1e-10 floor (whisper.cpp:2737-2780);
- global ``max - 8`` clamp and ``(x + 4) / 4`` normalization
  (whisper.cpp:2855-2871);
- frame count n_len = (len_padded - 400) / 160, valid-content length
  n_len_org = 1 + (n_samples + 200 - 400) / 160 (whisper.cpp:2832-2834).

TPU-first design: the recursive Cooley-Tukey FFT of the reference
(whisper.cpp:2659-2710) is replaced by a *DFT-as-matmul*: frames (F, 400)
hit two (400, 204) cos/sin bases on the MXU, followed by the mel projection
matmul — three dense GEMMs instead of a scalar FFT, which is exactly what
the systolic array wants at N_FFT=400.  A fused Pallas kernel lives in
``ops/mel_kernel.py``; this module is the reference jnp path and the host
oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.config import (CHUNK_SECONDS, HOP_LENGTH, N_FFT, SAMPLE_RATE)

N_FFT_BINS = N_FFT // 2 + 1  # 201
_PAD = N_FFT // 2            # 200
_CHUNK = CHUNK_SECONDS * SAMPLE_RATE  # 480_000
# Bins padded to a lane-friendly multiple for the matmul path; the extra
# columns are zero in the mel filterbank so they contribute nothing.
_BINS_PADDED = 204


# ------------------------------------------------------------------ filterbank
def mel_filterbank(n_mels: int, n_fft: int = N_FFT,
                   sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale mel filterbank, shape (n_mels, n_fft//2+1).

    Matches librosa.filters.mel(norm="slaney", htk=False), which is what the
    OpenAI Whisper release bakes into its checkpoints (and hence what ships
    inside ggml .bin files, whisper.cpp:1193-1203).  Real checkpoints carry
    their own filters; this is for synthetic models and benches.
    """
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_bins)

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
            mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        hz = m * (200.0 / 3)
        log_region = m >= 15.0
        hz = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), hz)
        return hz

    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sample_rate / 2),
                                    n_mels + 2))
    weights = np.zeros((n_mels, n_bins), dtype=np.float64)
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann (whisper.cpp:2712-2725 with periodic=true)."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def pad_audio(samples: np.ndarray) -> np.ndarray:
    """Reference padding: reflect 200 at head, 30 s zeros + 400 at tail
    (whisper.cpp:2814-2827)."""
    samples = np.asarray(samples, dtype=np.float32)
    n = len(samples)
    head = samples[1:_PAD + 1][::-1] if n > _PAD else np.concatenate(
        [samples[1:][::-1], np.zeros(_PAD - max(0, n - 1), dtype=np.float32)])
    tail = np.zeros(_CHUNK + _PAD, dtype=np.float32)
    return np.concatenate([head, samples, tail])


def frame_counts(n_samples: int) -> Tuple[int, int]:
    """(n_len, n_len_org) as computed at whisper.cpp:2832-2834."""
    padded = n_samples + _CHUNK + 2 * _PAD
    n_len = (padded - N_FFT) // HOP_LENGTH
    n_len_org = 1 + (n_samples + _PAD - N_FFT) // HOP_LENGTH
    return n_len, n_len_org


# ---------------------------------------------------------------- numpy oracle
def log_mel_np(samples: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """Float64 host oracle, bit-faithful to the reference algorithm.

    Returns (n_mels, n_len).  Used for golden tests of the TPU path.
    """
    filters = np.asarray(filters, dtype=np.float64)
    n_mels = filters.shape[0]
    padded = pad_audio(samples).astype(np.float64)
    n_len, _ = frame_counts(len(samples))
    window = hann_window().astype(np.float64)

    mel = np.full((n_mels, n_len), np.log10(1e-10))
    # Frames beyond the all-zero threshold keep log10(1e-10)
    # (whisper.cpp:2737, 2783-2789); zero frames computed numerically give
    # the identical value, so compute them all.
    for i in range(n_len):
        frame = padded[i * HOP_LENGTH: i * HOP_LENGTH + N_FFT] * window
        spec = np.fft.rfft(frame, n=N_FFT)
        power = (spec.real ** 2 + spec.imag ** 2)[:N_FFT_BINS]
        mel[:, i] = np.log10(np.maximum(filters @ power, 1e-10))

    mmax = mel.max() - 8.0
    mel = np.maximum(mel, mmax)
    return ((mel + 4.0) / 4.0).astype(np.float32)


# ------------------------------------------------------------------- jnp path
@functools.lru_cache(maxsize=8)
def _dft_bases(dtype_name: str):
    """Cos/sin DFT bases (N_FFT, _BINS_PADDED); columns >= 201 are zero."""
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    k = np.arange(_BINS_PADDED, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * n * k / N_FFT
    cos_b = np.cos(theta)
    sin_b = -np.sin(theta)
    cos_b[:, N_FFT_BINS:] = 0.0
    sin_b[:, N_FFT_BINS:] = 0.0
    dt = jnp.dtype(dtype_name)
    return (jnp.asarray(cos_b, dtype=dt) , jnp.asarray(sin_b, dtype=dt))


def _pad_filters(filters: np.ndarray) -> np.ndarray:
    """(n_mels, 201) -> (BINS_PADDED, n_mels) transposed + zero-padded."""
    n_mels = filters.shape[0]
    out = np.zeros((_BINS_PADDED, n_mels), dtype=np.float32)
    out[:N_FFT_BINS] = np.asarray(filters, dtype=np.float32).T
    return out


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _log_mel_frames(padded: jax.Array, filters_t: jax.Array,
                    window: jax.Array, n_frames: int) -> jax.Array:
    """Jitted core: padded samples -> normalized log-mel (n_mels, n_frames).

    All-matmul: frame gather -> window -> [frames @ cosB, frames @ sinB]
    -> power -> @ melT -> log10 -> global max-8 clamp -> (x+4)/4.
    """
    idx = (jnp.arange(n_frames)[:, None] * HOP_LENGTH
           + jnp.arange(N_FFT)[None, :])
    frames = padded[idx] * window[None, :]
    cos_b, sin_b = _dft_bases("float32")
    re = jnp.dot(frames, cos_b, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_b, preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, filters_t, preferred_element_type=jnp.float32)
    mel = jnp.log10(jnp.maximum(mel, 1e-10))
    mmax = jnp.max(mel) - 8.0
    mel = jnp.maximum(mel, mmax)
    return ((mel + 4.0) / 4.0).T  # (n_mels, n_frames)


class MelFrontend:
    """Stateful wrapper caching device-side constants per filterbank."""

    def __init__(self, filters: np.ndarray):
        self.filters = np.asarray(filters, dtype=np.float32)
        self.n_mels = self.filters.shape[0]
        self._filters_t = jnp.asarray(_pad_filters(self.filters))
        self._window = jnp.asarray(hann_window())

    def __call__(self, samples: np.ndarray) -> np.ndarray:
        """Whole-utterance mel, shape (n_mels, n_len). Host in, host out."""
        samples = np.asarray(samples, dtype=np.float32)
        n_len, _ = frame_counts(len(samples))
        padded = pad_audio(samples)
        # Bucket the padded length to 30 s multiples to bound jit cache size.
        bucket = -(-len(padded) // _CHUNK) * _CHUNK
        padded = np.pad(padded, (0, bucket - len(padded)))
        n_frames_bucket = (bucket - N_FFT) // HOP_LENGTH + 1
        mel = _log_mel_frames(jnp.asarray(padded), self._filters_t,
                              self._window, n_frames_bucket)
        out = np.asarray(mel)[:, :n_len]
        return out

    def mel_len(self, n_samples: int) -> Tuple[int, int]:
        return frame_counts(n_samples)
