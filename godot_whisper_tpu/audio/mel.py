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
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

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


def log_mel_frames_raw(padded: np.ndarray, filters: np.ndarray,
                       i0: int, i1: int) -> np.ndarray:
    """UN-normalized log10-mel of frames [i0, i1) over an already-padded
    sample stream — the incremental-streaming unit of work: each frame
    only depends on its own 400 samples, so only NEW frames are computed
    per interval; the global max-8 clamp + (x+4)/4 normalization (which
    depend on the WHOLE clip) are applied device-side at decode time
    (runtime/streaming.py).  Returns (n_mels, i1-i0) float32 of raw
    log10 values (zero audio gives exactly log10(1e-10))."""
    filters = np.asarray(filters, dtype=np.float32)
    window = hann_window()
    n = i1 - i0
    frames = np.lib.stride_tricks.as_strided(
        padded[i0 * HOP_LENGTH:], shape=(n, N_FFT),
        strides=(padded.strides[0] * HOP_LENGTH, padded.strides[0]))
    spec = np.fft.rfft(frames * window, n=N_FFT, axis=1)
    power = np.abs(spec) ** 2
    return np.log10(np.maximum(power @ filters.T, 1e-10)).T.astype(
        np.float32)


def log_mel_host(samples: np.ndarray, filters: np.ndarray,
                 n_frames: Optional[int] = None) -> np.ndarray:
    """Fast vectorized host mel (float32): same algorithm as the f64
    oracle above but framed via stride tricks + one batched rfft + one
    BLAS matmul — ~100x the oracle's throughput.

    Exists for relay/tunneled runtimes where host->device bandwidth is
    the bottleneck: a mel frame is half the bytes of the audio it came
    from (80 floats per 160 samples), so computing mel host-side and
    shipping it f16 halves the dominant transfer
    (MelFrontend GWT_HOST_MEL / axon auto-detection).
    Returns (n_mels, n_frames or n_len) float32.
    """
    filters = np.asarray(filters, dtype=np.float32)
    padded = pad_audio(samples)
    n_len, _ = frame_counts(len(samples))
    n_out = n_frames if n_frames is not None else n_len
    window = hann_window()

    n_use = min(n_out, n_len)
    frames = np.lib.stride_tricks.as_strided(
        padded, shape=(n_use, N_FFT),
        strides=(padded.strides[0] * HOP_LENGTH, padded.strides[0]))
    spec = np.fft.rfft(frames * window, n=N_FFT, axis=1)
    power = np.abs(spec) ** 2                              # (F, 201)
    mel = np.log10(np.maximum(power @ filters.T, 1e-10))   # (F, n_mels)
    mmax = mel.max() - 8.0
    out = np.empty((filters.shape[0], n_out), np.float32)
    out[:, :n_use] = ((np.maximum(mel, mmax) + 4.0) / 4.0).T
    if n_out > n_use:
        out[:, n_use:] = (max(np.log10(1e-10), mmax) + 4.0) / 4.0
    return out


@jax.jit
def _upcast_mel(m_f16: jax.Array) -> jax.Array:
    """f16 wire format -> f32 device mel (one tiny fused op)."""
    return m_f16.astype(jnp.float32)


def _mel_wire_int8() -> bool:
    """int8 wire format for host-computed mel: normalized mel spans
    EXACTLY 2.0 units (the max-8 clamp maps to [(mmax-4)/4, (mmax+4)/4]),
    so a per-clip affine uint8 encoding has 2/255 = 0.008 granularity —
    half the f16 bytes again.

    STRICTLY OPT-IN (GWT_MEL_WIRE=int8): it measurably lifts batched
    throughput on slow links (BENCH_r03: f16 wire saturated a ~29 MB/s
    relay at ~1172 audio-s/s, int8 reached 1451) but it is a LOSSIER
    decode input than the reference's f16 mel storage, and the project's
    WER-parity invariant has not yet been validated on real weights —
    f16 stays the default until a real-checkpoint WER comparison
    (EVAL.md runbook) clears int8.  An earlier auto-engage on probed
    link speed silently changed decode inputs on the primary deployment
    (advisor r4 finding #2) and was reverted."""
    return os.environ.get("GWT_MEL_WIRE") == "int8"


def _encode_mel_u8(m_norm: np.ndarray):
    """Normalized f32 mel -> (uint8, f32 offset) with scale 2/255."""
    off = np.float32(m_norm.min())
    q = np.clip(np.round((m_norm - off) * (255.0 / 2.0)), 0, 255)
    return q.astype(np.uint8), off


@functools.partial(jax.jit, static_argnums=())
def _decode_mel_u8(q: jax.Array, off: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * jnp.float32(2.0 / 255.0) + off


@jax.jit
def _normalize_raw_mel(raw_f16: jax.Array) -> jax.Array:
    """RAW log10-mel wire chunks -> normalized f32 device mel: the
    whole-clip max-8 clamp + (x+4)/4 (whisper.cpp:2855-2871) as one
    device op (raw frames are per-chunk independent; the normalization
    is the only whole-clip dependency)."""
    m = raw_f16.astype(jnp.float32)
    mmax = jnp.max(m) - 8.0
    return (jnp.maximum(m, mmax) + 4.0) / 4.0


# ------------------------------------------------------------------- jnp path
_SUB = 80  # gcd(N_FFT, HOP_LENGTH): framing becomes strided row slices


@functools.lru_cache(maxsize=2)
def _windowed_dft_basis():
    """Windowed DFT basis (N_FFT, 2*_BINS_PADDED): hann*cos | -hann*sin.

    The Hann window is folded into the basis so the whole STFT is a single
    (n_frames, 400) @ (400, 408) matmul on the MXU.  NOTE: passed to the
    jitted core as an ARGUMENT, never closed over — large trace-time
    constants embedded in the HLO blow compile time up by orders of
    magnitude on remote-compile toolchains.
    """
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    k = np.arange(_BINS_PADDED, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * n * k / N_FFT
    cos_b = np.cos(theta)
    sin_b = -np.sin(theta)
    cos_b[:, N_FFT_BINS:] = 0.0
    sin_b[:, N_FFT_BINS:] = 0.0
    win = hann_window().astype(np.float64)[:, None]
    return jnp.asarray(np.concatenate([cos_b * win, sin_b * win], axis=1),
                       dtype=jnp.float32)


def _pad_filters(filters: np.ndarray) -> np.ndarray:
    """(n_mels, 201) -> (BINS_PADDED, n_mels) transposed + zero-padded."""
    n_mels = filters.shape[0]
    out = np.zeros((_BINS_PADDED, n_mels), dtype=np.float32)
    out[:N_FFT_BINS] = np.asarray(filters, dtype=np.float32).T
    return out


@jax.jit
def _log_mel_frames(padded_f16: jax.Array, basis: jax.Array,
                    filters_t: jax.Array) -> jax.Array:
    """Jitted core: padded samples -> normalized log-mel (n_mels, n_frames).

    Overlapping frames (hop 160 < width 400) are materialized WITHOUT a
    gather or conv: reshape to 80-sample rows, take 5 stride-2 row slices
    and concatenate — frame i = rows[2i .. 2i+4].  Then one MXU matmul
    against the windowed DFT basis, power, mel projection, log10, global
    max-8 clamp, (x+4)/4 (whisper.cpp:2855-2871).
    """
    # audio crosses host->device as float16 (PCM has 16-bit precision
    # anyway; halves the transfer) and is upcast here
    padded = padded_f16.astype(jnp.float32)
    rows = padded.reshape(-1, _SUB)                    # (M, 80)
    n_frames = (padded.shape[0] - N_FFT) // HOP_LENGTH + 1
    cols = [lax.slice(rows, (j, 0), (j + 2 * (n_frames - 1) + 1, _SUB),
                      (2, 1))
            for j in range(N_FFT // _SUB)]             # 5 x (n_frames, 80)
    frames = jnp.concatenate(cols, axis=1)             # (n_frames, 400)

    spec = jnp.dot(frames, basis,
                   preferred_element_type=jnp.float32)  # (n_frames, 408)
    re, im = spec[:, :_BINS_PADDED], spec[:, _BINS_PADDED:]
    power = re * re + im * im
    mel = jnp.dot(power, filters_t, preferred_element_type=jnp.float32)
    mel = jnp.log10(jnp.maximum(mel, 1e-10))
    mmax = jnp.max(mel) - 8.0
    mel = jnp.maximum(mel, mmax)
    return ((mel + 4.0) / 4.0).T  # (n_mels, n_frames)


@jax.jit
def _log_mel_frames_batched(padded_f16: jax.Array, basis: jax.Array,
                            filters_t: jax.Array) -> jax.Array:
    """Batched mel over (B, L) padded audio -> (B, n_mels, n_frames).

    Same math as _log_mel_frames; the max-8 clamp is PER CLIP, matching a
    per-utterance reference run."""
    padded = padded_f16.astype(jnp.float32)
    B, L = padded.shape
    rows = padded.reshape(B, -1, _SUB)
    n_frames = (L - N_FFT) // HOP_LENGTH + 1
    cols = [lax.slice(rows, (0, j, 0),
                      (B, j + 2 * (n_frames - 1) + 1, _SUB), (1, 2, 1))
            for j in range(N_FFT // _SUB)]
    frames = jnp.concatenate(cols, axis=2)             # (B, n_frames, 400)
    spec = jnp.einsum("bfw,wk->bfk", frames, basis,
                      preferred_element_type=jnp.float32)
    re, im = spec[..., :_BINS_PADDED], spec[..., _BINS_PADDED:]
    power = re * re + im * im
    mel = jnp.einsum("bfk,km->bfm", power, filters_t,
                     preferred_element_type=jnp.float32)
    mel = jnp.log10(jnp.maximum(mel, 1e-10))
    mmax = jnp.max(mel, axis=(1, 2), keepdims=True) - 8.0
    mel = jnp.maximum(mel, mmax)
    return ((mel + 4.0) / 4.0).transpose(0, 2, 1)      # (B, n_mels, F)


class MelFrontend:
    """Stateful wrapper caching device-side constants per filterbank."""

    def __init__(self, filters: np.ndarray):
        self.filters = np.asarray(filters, dtype=np.float32)
        self.n_mels = self.filters.shape[0]
        self._filters_t = jnp.asarray(_pad_filters(self.filters))
        self._filt256_cache = None

    def _use_kernel(self) -> bool:
        from ..ops.attention import use_pallas
        return use_pallas()

    @staticmethod
    @functools.lru_cache(maxsize=1)
    def _link_bw() -> float:
        """Host->device link bandwidth, probed ONCE with a 2 MB
        transfer (bytes/s; inf when probing is impossible)."""
        import time
        try:
            if jax.devices()[0].platform not in ("tpu", "axon"):
                return float("inf")
            buf = np.zeros(1 << 20, np.float16)  # 2 MB
            jax.block_until_ready(jax.device_put(buf))  # warm the path
            t0 = time.perf_counter()
            d = jax.device_put(buf)
            _ = float(jnp.sum(d.astype(jnp.float32).ravel()[:2]))
            return buf.nbytes / max(time.perf_counter() - t0, 1e-9)
        except Exception:  # pragma: no cover
            return float("inf")

    @staticmethod
    @functools.lru_cache(maxsize=1)
    def _host_mel() -> bool:
        """Compute mel on host + ship f16 frames instead of audio —
        the BATCH/throughput policy.

        Default ON for slow host->device links (relay-tunneled runtimes
        measure ~29 MB/s; mel is half the bytes of the audio it encodes
        AND the batch pipeline computes it in a prefetch thread that
        overlaps the previous batch's decode, so its CPU cost hides),
        OFF for locally-attached accelerators (PCIe uploads audio faster
        than a host CPU computes mel).  Force with GWT_HOST_MEL=0/1.
        """
        import os
        v = os.environ.get("GWT_HOST_MEL")
        if v is not None:
            return v == "1"
        return MelFrontend._link_bw() < 200e6

    @staticmethod
    @functools.lru_cache(maxsize=1)
    def _host_mel_single() -> bool:
        """Host-mel policy for ONE-SHOT single-clip latency, where the
        host FFT (~3.3 ms per audio-second, measured t_mel ~200 ms for a
        60 s clip) is on the critical path with nothing to hide behind.
        Device mel costs only the 2x audio upload (f16 PCM) plus ~0.3 ms
        of MXU work, so it wins whenever
        ``link > audio_bytes/s / host_mel_s/s ~= 10 MB/s`` — host mel
        engages only on links slower than that (r5 finding: the old
        single-clip host-mel default burned ~370 us/step-e2e of
        large-v3's per-token budget at a 30-40 MB/s link)."""
        import os
        v = os.environ.get("GWT_HOST_MEL")
        if v is not None:
            return v == "1"
        return MelFrontend._link_bw() < 12e6

    def _filt256(self):
        if self._filt256_cache is None:
            from ..ops.mel_kernel import pad_filters_256
            self._filt256_cache = pad_filters_256(self.filters)
        return self._filt256_cache

    def device(self, samples: np.ndarray):
        """Device-resident mel: (jnp (n_mels, bucketed_frames), n_len).

        The array stays on the TPU — window slicing for the encoder happens
        device-side (the reference instead copies each window through the
        host, whisper.cpp:1692-1706).
        """
        samples = np.asarray(samples, dtype=np.float32)
        n_len, _ = frame_counts(len(samples))
        padded = pad_audio(samples)
        # Bucket the padded length to 30 s multiples to bound jit cache size.
        bucket = -(-len(padded) // _CHUNK) * _CHUNK
        if self._host_mel_single():
            # slow-link path: RAW log-mel computed host-side in ~30 s
            # chunks with each chunk's f16 upload riding the wire while
            # the next chunk FFTs; the clip-global max-8 clamp +
            # normalization run as one device op at the end.  Mel is
            # half the bytes of the audio AND compute overlaps transfer.
            n_frames = (bucket - N_FFT) // HOP_LENGTH + 1
            full_pad = np.concatenate(
                [padded, np.zeros(bucket + N_FFT - len(padded),
                                  np.float32)])
            step = _CHUNK // HOP_LENGTH          # 3000 frames per chunk
            parts = []
            for i0 in range(0, n_frames, step):
                i1 = min(i0 + step, n_frames)
                raw = log_mel_frames_raw(full_pad, self.filters, i0, i1)
                parts.append(jax.device_put(raw.astype(np.float16)))
            mel = _normalize_raw_mel(
                parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=1))
            return mel, min(n_len, mel.shape[1])
        padded = np.pad(padded, (0, bucket - len(padded)))
        if self._use_kernel():
            from ..ops.mel_kernel import log_mel_pallas
            mel = log_mel_pallas(
                jnp.asarray(padded.astype(np.float16))[None],
                self.filters, self._filt256())[0]
        else:
            mel = _log_mel_frames(jnp.asarray(padded.astype(np.float16)),
                                  _windowed_dft_basis(), self._filters_t)
        return mel, min(n_len, mel.shape[1])

    def device_batch(self, clips, host_mels=None):
        """Batched device mel for a list of clips.

        Returns (jnp (B, n_mels, frames_bucket), [n_len per clip]).  All
        clips are padded into the bucket of the LONGEST clip — use for
        similarly-sized utterances (the batch transcriber's case).
        ``host_mels``: precomputed ``precompute_host_mels`` output (the
        pipelined serving loop computes batch k+1's mel on a worker
        thread while batch k decodes).
        """
        n_lens = [frame_counts(len(c))[0] for c in clips]
        padded = [pad_audio(c) for c in clips]
        bucket = max(-(-len(p) // _CHUNK) * _CHUNK for p in padded)
        if self._host_mel():
            n_frames = (bucket - N_FFT) // HOP_LENGTH + 1
            # per-clip async upload: the wire transfer of clip i rides
            # the (relay) link while the host FFTs clip i+1
            if host_mels is None:
                host_mels = self.precompute_host_mels(
                    clips, n_frames=n_frames)
            if _mel_wire_int8():
                parts = [_decode_mel_u8(jax.device_put(q),
                                        jnp.float32(off))
                         for q, off in host_mels]
                mel = jnp.stack(parts)
            else:
                parts = [jax.device_put(m) for m in host_mels]
                mel = _upcast_mel(jnp.stack(parts))
            n_lens = [min(n, mel.shape[2]) for n in n_lens]
            return mel, n_lens
        stack = np.zeros((len(clips), bucket), dtype=np.float16)
        for i, p in enumerate(padded):
            stack[i, :len(p)] = p.astype(np.float16)
        if self._use_kernel():
            from ..ops.mel_kernel import log_mel_pallas
            mel = log_mel_pallas(jnp.asarray(stack), self.filters,
                                 self._filt256())
        else:
            mel = _log_mel_frames_batched(jnp.asarray(stack),
                                          _windowed_dft_basis(),
                                          self._filters_t)
        n_lens = [min(n, mel.shape[2]) for n in n_lens]
        return mel, n_lens

    def precompute_host_mels(self, clips, n_frames: Optional[int] = None):
        """Host half of ``device_batch`` for prefetch threads: mel frames
        ready to ship (f16, or (uint8, offset) pairs under
        GWT_MEL_WIRE=int8).  Only meaningful in host-mel mode."""
        if not self._host_mel():
            return None
        if n_frames is None:
            padded_len = [len(c) + _CHUNK + 2 * _PAD for c in clips]
            bucket = max(-(-p // _CHUNK) * _CHUNK for p in padded_len)
            n_frames = (bucket - N_FFT) // HOP_LENGTH + 1
        mels = [log_mel_host(c, self.filters, n_frames=n_frames)
                for c in clips]
        if _mel_wire_int8():
            return [_encode_mel_u8(m) for m in mels]
        return [m.astype(np.float16) for m in mels]

    def __call__(self, samples: np.ndarray) -> np.ndarray:
        """Whole-utterance mel, shape (n_mels, n_len). Host in, host out."""
        mel, n_len = self.device(samples)
        return np.asarray(mel)[:, :n_len]

    def mel_len(self, n_samples: int) -> Tuple[int, int]:
        return frame_counts(n_samples)
