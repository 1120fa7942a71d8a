"""Fused Pallas log-mel kernel (TPU): frame -> windowed DFT -> power ->
mel projection -> log10 in ONE program.

The reference computes mel on CPU threads with a recursive radix-2 FFT per
10 ms frame (/root/reference/thirdparty/whisper.cpp/whisper.cpp:2614-2780,
worker striping :2838-2853).  The TPU-first replacement is matmul-shaped:
at N_FFT=400 a dense DFT basis is tiny, so the whole spectrogram is two
MXU GEMMs.  The jnp path in audio/mel.py materializes the overlapping
frame matrix (F, 400) plus spectrum and power intermediates in HBM; this
kernel keeps all of them in VMEM:

- audio rides in as (B, R, 160) f16 rows (hop-length rows, so framing is
  three CONTIGUOUS row slices per 256-frame chunk: frame i = rows
  [i, i+1, i+2[:80]] — no gather, no stride tricks inside the kernel);
- per (clip, chunk) program: slice rows -> build (256, 400) frames ->
  (400, 512) windowed cos|sin basis GEMM -> power -> (256, 128) mel GEMM
  -> log10, all in VMEM; only the final (256, 128) log-mel block is
  written back.

The global max-8 clamp and (x+4)/4 normalization (whisper.cpp:2855-2871)
need the whole-clip max and stay in XLA outside the kernel.

Numerics match audio/mel.py's jnp path (same basis construction, f32
accumulation); golden tests compare both against the f64 oracle.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from ..models.config import HOP_LENGTH, N_FFT

_BINS = N_FFT // 2 + 1     # 201
_HALF = 256                # lane-padded bin count (cos block | sin block)
_CHUNK_F = 256             # frames per program


@functools.lru_cache(maxsize=1)
def dft_basis_512() -> jax.Array:
    """(480, 512) windowed DFT basis: cols [0:201] hann*cos, [256:457]
    -hann*sin, zero elsewhere.  Rows are zero-padded 400 -> 480 (three
    160-row panels) so the kernel's frame matmul decomposes into three
    row-aligned GEMMs — Mosaic cannot concat sublane slices at odd
    offsets, so frames are never materialized."""
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    k = np.arange(_BINS, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * n * k / N_FFT
    win = (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT))
           )[:, None]  # periodic Hann (whisper.cpp:2712-2725)
    out = np.zeros((3 * HOP_LENGTH, 2 * _HALF), dtype=np.float32)
    out[:N_FFT, :_BINS] = np.cos(theta) * win
    out[:N_FFT, _HALF:_HALF + _BINS] = -np.sin(theta) * win
    return jnp.asarray(out)


def pad_filters_256(filters: np.ndarray) -> jax.Array:
    """(n_mels, 201) filterbank -> (256, 128) zero-padded transpose."""
    n_mels = filters.shape[0]
    out = np.zeros((_HALF, max(128, n_mels)), dtype=np.float32)
    out[:_BINS, :n_mels] = np.asarray(filters, dtype=np.float32).T
    return jnp.asarray(out)


def _mel_kernel(rows_ref, tail_ref, basis_ref, filt_ref, out_ref):
    ext = jnp.concatenate([rows_ref[0], tail_ref[0, 0]],
                          axis=0)                       # (256+8, 160)
    h = HOP_LENGTH
    # frame i spans rows [i, i+1, i+2(:80)]; instead of materializing the
    # (256, 400) frame matrix (sublane-offset concats are unsupported in
    # Mosaic), shift rows with pltpu.roll and sum three row-aligned GEMMs
    # against the corresponding 160-row basis panels (panel 3's rows
    # 80..159 are zero, masking the half-row overhang)
    n_ext = ext.shape[0]
    a = ext[0:_CHUNK_F]
    b = pltpu.roll(ext, n_ext - 1, 0)[0:_CHUNK_F]  # up-shift by 1 row
    c = pltpu.roll(ext, n_ext - 2, 0)[0:_CHUNK_F]  # up-shift by 2 rows
    spec = (jnp.dot(a, basis_ref[0:h], preferred_element_type=jnp.float32)
            + jnp.dot(b, basis_ref[h:2 * h],
                      preferred_element_type=jnp.float32)
            + jnp.dot(c, basis_ref[2 * h:3 * h],
                      preferred_element_type=jnp.float32))  # (256, 512)
    re, im = spec[:, :_HALF], spec[:, _HALF:]
    power = re * re + im * im
    mel = jnp.dot(power, filt_ref[:],
                  preferred_element_type=jnp.float32)   # (256, 128)
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_frames", "n_mels"))
def _log_mel_pallas(padded_f16: jax.Array, basis: jax.Array,
                    filt: jax.Array, n_frames: int, n_mels: int
                    ) -> jax.Array:
    """(B, L) f16 padded audio -> (B, n_mels, n_frames) normalized log-mel
    (per-clip max clamp, matching audio/mel.py's batched path).

    Audio crosses the relay f16 and is upcast to f32 here — Mosaic has no
    f16, and bf16's 8 mantissa bits are too coarse for 16-bit PCM.  Frame
    chunks grid over (clip, chunk); each program reads its own 256-row
    block plus an 8-row overlap tail (frames straddle chunk edges by 2
    rows), so VMEM holds ~165 KB of audio per step regardless of clip
    length."""
    B, L = padded_f16.shape
    assert L % HOP_LENGTH == 0, L
    rows = padded_f16.astype(jnp.float32).reshape(
        B, L // HOP_LENGTH, HOP_LENGTH)
    nc = -(-n_frames // _CHUNK_F)
    r_need = (nc + 1) * _CHUNK_F  # one spare chunk covers every tail slice
    if rows.shape[1] < r_need:
        rows = jnp.pad(rows, ((0, 0), (0, r_need - rows.shape[1]), (0, 0)))
    # tails[b, c] = rows[b, (c+1)*CHUNK : (c+1)*CHUNK + 8] — the 2 overlap
    # rows each chunk borrows from its successor (padded to the 8-sublane
    # tile)
    tails = rows[:, _CHUNK_F:_CHUNK_F * (nc + 1)].reshape(
        B, nc, _CHUNK_F, HOP_LENGTH)[:, :, :8]
    mcols = filt.shape[1]

    out = pl.pallas_call(
        _mel_kernel,
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, _CHUNK_F, HOP_LENGTH),
                         lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, HOP_LENGTH),
                         lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * HOP_LENGTH, 2 * _HALF), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALF, mcols), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _CHUNK_F, mcols),
                               lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nc * _CHUNK_F, mcols),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nc * _CHUNK_F * N_FFT * 2 * _HALF
            + 2 * B * nc * _CHUNK_F * _HALF * mcols,
            bytes_accessed=B * L * 4 + B * nc * _CHUNK_F * mcols * 4,
            transcendentals=B * nc * _CHUNK_F * mcols),
        interpret=os.environ.get("GWT_PALLAS_INTERPRET") == "1",
    )(rows[:, :nc * _CHUNK_F], tails, basis, filt)

    mel = out[:, :n_frames, :n_mels]                    # (B, F, n_mels)
    mmax = jnp.max(mel, axis=(1, 2), keepdims=True) - 8.0
    mel = jnp.maximum(mel, mmax)
    return ((mel + 4.0) / 4.0).transpose(0, 2, 1)       # (B, n_mels, F)


def log_mel_pallas(padded_f16: jax.Array, filters: np.ndarray,
                   filt_dev: jax.Array) -> jax.Array:
    """Public entry: (B, L) f16 padded audio (L a hop multiple) ->
    (B, n_mels, n_frames).  ``filt_dev`` is the cached pad_filters_256
    array of ``filters``."""
    B, L = padded_f16.shape
    n_frames = (L - N_FFT) // HOP_LENGTH + 1
    return _log_mel_pallas(padded_f16, dft_basis_512(), filt_dev,
                           n_frames, filters.shape[0])
