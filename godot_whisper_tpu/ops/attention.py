"""Pallas flash-attention kernel for the encoder (TPU).

Replaces the materialize-scores attention of the reference
(/root/reference/thirdparty/whisper.cpp/whisper.cpp:1880-1911 — permute,
mul_mat, softmax, mul_mat; the ggml flash-attn variant at :1854-1878 is
compile-time disabled) with a single-pass whole-T kernel: scores never
leave VMEM, HBM traffic drops from O(T^2) to O(T*D) per head, and the
mask + softmax row-sum are folded into the two MXU contractions (see
_flash_sp_kernel).  A blockwise online-softmax kernel remains as the
fallback for T beyond VMEM capacity.

Shapes: encoder self-attention is (B*H, T, Dh) with T = n_audio_ctx
(1500, padded here to a 512-multiple with masked tail) and Dh = 64.
Decoder-side attention keeps the einsum path — its 448-token ctx is
latency- not bandwidth-bound and lives inside the decode jit.

The public entry ``flash_attention(q, k, v)`` pads/masks as needed and
falls back to the einsum path off-TPU (CPU tests) or via
``GWT_DISABLE_PALLAS=1``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

try:  # pallas import guarded for minimal CPU environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_NEG_INF = -1e30

# Block sizes: q rows per program, k columns per inner step (looped
# fallback kernel only — used when T exceeds _SP_MAX_T).
_BLOCK_Q = 256
_BLOCK_K = 512

# Single-pass kernel: max padded T for which the whole (T, T) score tile
# stays in VMEM (1536 -> s 9.4 MB f32 + p 4.7 MB bf16; 2048 would be
# 16.8 + 8.4 MB and spills).  Encoder T is n_audio_ctx <= 1500 padded to
# 1536, so every production shape takes this path.
_SP_MAX_T = 1536


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t_pad: int,
                  t_valid: int):
    """Looped fallback (T > _SP_MAX_T only): one (batch*head, q-block)
    program streaming K/V blocks with online softmax, masking the padded
    key tail.

    Matmuls run at the INPUT precision (bf16 on the encoder path) with
    f32 accumulation — numerically the same contraction the XLA einsum
    path performs.  Measured FLAT ~54 TFLOPS = 0.28 roofline at every
    encoder shape (KERNELS_r04/r05) regardless of dtype: the cap is the
    per-block online-softmax bookkeeping (running max/corrections, the
    masking iota/where, and the lane-direction row-sum), not the exp —
    an A/B with exp removed entirely recovered only 10%.  That is why
    the production path is the single-pass kernel above; this one exists
    only for hypothetical T beyond VMEM.  The (BH, T, D) operand layout
    is produced for FREE by the encoder's head-major projections
    (models/model.py folds the head transpose into the q/k/v and
    out-proj einsums — an explicit (B, T, H, D) -> (BH, T, D) transpose
    around the kernel measured as expensive as the kernel itself)."""
    cdt = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32
    q = q_ref[0].astype(cdt)                        # (BQ, D)
    bq, d = q.shape

    n_k_blocks = t_pad // _BLOCK_K

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * _BLOCK_K, _BLOCK_K), :].astype(cdt)
        v = v_ref[0, pl.ds(i * _BLOCK_K, _BLOCK_K), :].astype(cdt)
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (BQ, BK) f32
        col = (i * _BLOCK_K
               + lax.broadcasted_iota(jnp.int32, (bq, _BLOCK_K), 1))
        s = jnp.where(col < t_valid, s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_i - m_new)
        l_new = l_i * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m_i = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l_i = jnp.zeros((bq, 1), jnp.float32)
    acc, m_i, l_i = lax.fori_loop(0, n_k_blocks, body, (acc, m_i, l_i))

    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _flash_sp_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    """Single-pass whole-T program: one QK matmul, plain softmax, one PV
    matmul — no online-softmax carries, no masking pass, no row-sum pass.

    Three fusions keep the VPU off the critical path (the looped kernel
    measured FLAT ~54 TFLOPS = 0.28 roofline at every shape, and an A/B
    with exp removed entirely recovered only 10% — the cost was carry
    bookkeeping + per-block masking + lane reductions, not exp):

    - pad-mask via an EXTENDED CONTRACTION COLUMN: q gains a constant-1
      column, k gains the (T,) bias column (0 valid / -1e30 pad), so the
      QK dot lands `s + bias` directly.  D 64 -> 65 is free — the MXU
      pads the contraction to 128 either way.  exp(-1e30 - m) underflows
      to exactly 0.0 (negative side is safe; the CLAUDE.md ones-matmul
      overflow trap is the positive side).
    - softmax row-sum via a ONES BLOCK appended to v: the PV dot at
      N = 128 costs the same MXU pass as N = 64, and column d of the
      accumulator IS sum(p) — the lane-reduction pass disappears.
    - scale folded into q (a (BQ, D) pass, 1/24th of scaling s).

    Measured (KERNELS job 004): 89.0 TFLOPS = 0.452 roofline at
    (48, 1536, 64), 82.5 = 0.419 at (160, 1536, 64) — +59% over the
    looped kernel, max_abs_err 2.8e-4 vs the f32 einsum oracle (bf16
    input rounding noise)."""
    cdt = q_ref.dtype if q_ref.dtype == jnp.bfloat16 else jnp.float32
    q = (q_ref[0] * scale).astype(cdt)              # (BQ, D)
    k = k_ref[0].astype(cdt)                        # (T, D)
    v = v_ref[0].astype(cdt)
    bq, d = q.shape
    t = k.shape[0]

    lane_q = lax.broadcasted_iota(jnp.int32, (bq, d), 1)
    q_ext = jnp.concatenate(
        [q, jnp.where(lane_q == 0, 1, 0).astype(cdt)], axis=1)
    lane_k = lax.broadcasted_iota(jnp.int32, (t, d), 1)
    bias_col = b_ref[...].reshape(t, 1)             # (T, 1) f32
    k_ext = jnp.concatenate(
        [k, jnp.where(lane_k == 0, bias_col, 0.0).astype(cdt)], axis=1)
    s = lax.dot_general(q_ext, k_ext, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (BQ, T)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(cdt)

    v_ext = jnp.concatenate([v, jnp.ones((t, d), cdt)], axis=1)
    acc = lax.dot_general(p, v_ext, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)  # (BQ, 2D)
    l = acc[:, d:d + 1]
    o_ref[0] = (acc[:, :d] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_sp(q: jax.Array, k: jax.Array, v: jax.Array,
              scale: float, t_valid: int) -> jax.Array:
    """Single-pass dispatch: one program per (batch*head), whole T."""
    bh, t, d = q.shape
    bias = jnp.where(jnp.arange(t) >= t_valid, _NEG_INF, 0.0
                     ).astype(jnp.float32).reshape(1, t)
    kernel = functools.partial(_flash_sp_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d,
            bytes_accessed=bh * t * d * 3 * 2 + bh * t * d * 2,
            transcendentals=bh * t * t),
        interpret=os.environ.get("GWT_PALLAS_INTERPRET") == "1",
    )(q, k, v, bias)


@functools.partial(jax.jit, static_argnames=("scale", "t_valid"))
def _flash_bthd(q: jax.Array, k: jax.Array, v: jax.Array,
                scale: float, t_valid: int) -> jax.Array:
    """(BH, T_pad, D) flash attention with key masking beyond t_valid."""
    bh, t, d = q.shape
    if t <= _SP_MAX_T:
        return _flash_sp(q, k, v, scale, t_valid)
    grid = (bh, t // _BLOCK_Q)

    kernel = functools.partial(_flash_kernel, scale=scale, t_pad=t,
                               t_valid=t_valid)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_Q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d,
            bytes_accessed=bh * t * d * 3 * 2 + bh * t * d * 2,
            transcendentals=bh * t * t),
        interpret=os.environ.get("GWT_PALLAS_INTERPRET") == "1",
    )(q, k, v)


def flash_attention_bh(q: jax.Array, k: jax.Array, v: jax.Array,
                       t_valid: Optional[int] = None) -> jax.Array:
    """Head-major entry: (BH, T, D) in, (BH, T, D) out — for callers
    whose projections already produce head-major activations (the
    encoder), so NO layout transpose exists on the path.

    ``t_valid``: real (unpadded) sequence length when the caller already
    runs at a kernel-block-aligned T (the encoder's pad-native mode —
    models/model.py pads the residual stream ONCE per window instead of
    this wrapper padding q/k/v and slicing the output around EVERY
    layer's kernel call); key columns >= t_valid are masked.  When T is
    not block-aligned, pads here (masked); einsum fallback off-TPU."""
    bh, t, d = q.shape
    tv = t if t_valid is None else t_valid
    scale = float(1.0 / (d ** 0.5))
    mode = _enc_attn_mode()
    use_flash = use_pallas() and mode != "einsum"
    if not use_flash:
        return _einsum_attention(q, k, v, scale, t_valid=tv)
    if t % _BLOCK_K == 0:
        return _flash_bthd(q, k, v, scale, tv)
    t_pad = -(-t // _BLOCK_K) * _BLOCK_K
    pad = [(0, 0), (0, t_pad - t), (0, 0)]
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    return _flash_bthd(qp, kp, vp, scale, tv)[:, :t]


def _einsum_attention(q, k, v, scale, t_valid: Optional[int] = None):
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if t_valid is not None and t_valid < k.shape[1]:
        s = jnp.where(jnp.arange(k.shape[1])[None, None, :] < t_valid,
                      s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def use_pallas() -> bool:
    if os.environ.get("GWT_PALLAS_INTERPRET") == "1":
        return _HAS_PALLAS  # interpreter mode for CPU kernel tests
    return (_HAS_PALLAS and _on_tpu()
            and os.environ.get("GWT_DISABLE_PALLAS") != "1")


# flash-vs-einsum crossover in total (batch * heads) rows.  With the
# r4 looped kernel einsum won up to BH = 12; the r5 single-pass kernel
# beats einsum at EVERY shape (on-chip job 005: BH=6 39.2 us vs 48.0;
# BH=20 136 vs 552; BH=160 1173 vs 4431 — XLA's materialized-scores
# path collapses to ~22 TFLOPS once the score tensor spills, the kernel
# holds 82-93 TFLOPS = 0.42-0.47 roofline).  Crossover retired; einsum
# remains reachable via GWT_ENC_ATTN=einsum for debugging.
_FLASH_MIN_BH = 0


def _enc_attn_mode() -> str:
    return os.environ.get("GWT_ENC_ATTN", "auto")


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Dense MHA over (B, T, H, Dh) tensors; returns the same shape.

    Shape-aware dispatch (see _FLASH_MIN_BH): small single-stream
    encoders take the XLA einsum, everything larger takes the Pallas
    flash kernel.  Pads T up to a 512-multiple for the kernel (masked
    tail); einsum always off-TPU.
    """
    b, t, h, d = q.shape
    scale = float(1.0 / (d ** 0.5))

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, -1, d)

    def from_bh(x, tt):
        return x.reshape(b, h, tt, d).transpose(0, 2, 1, 3)

    mode = _enc_attn_mode()
    use_flash = use_pallas() and (
        mode == "flash" or (mode != "einsum" and b * h >= _FLASH_MIN_BH))
    if not use_flash:
        return from_bh(_einsum_attention(to_bh(q), to_bh(k), to_bh(v),
                                         scale), t)

    t_pad = -(-t // _BLOCK_K) * _BLOCK_K
    pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    out = _flash_bthd(to_bh(qp), to_bh(kp), to_bh(vp), scale, t)
    return from_bh(out, t_pad)[:, :t]
