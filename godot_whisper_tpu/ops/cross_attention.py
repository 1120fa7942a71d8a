"""Pallas cross-attention kernel over int8-quantized KV (TPU).

large-v3 decode is HBM-bandwidth-bound and the cross-attention KV is its
largest per-step read after the weights: L*T*H*D * 2 tensors
(~245 MB bf16 per stream at L=32, T=1500).  The reference amortizes the
cross K/V *projections* across steps (whisper.cpp:2005-2074) but still
streams full-precision K/V through every decode step's mat-vecs
(whisper.cpp:2357-2423).  Storing the cache int8 halves that traffic — but
only if the upcast happens on-chip: the plain-XLA formulation
(``einsum(q, k_q.astype(f32) * k_s)``) materializes dequantized copies in
HBM and measured *slower* than bf16 (docs/SCALING.md).  This kernel DMAs
the int8 blocks into VMEM, upcasts there, and never writes scores or
dequantized KV back to HBM.

Numerics: q stays bf16 (no activation quantization), K/V are upcast to
bf16 with their float32 scales applied in VMEM, scores/softmax/accumulate
in float32.  This is strictly more accurate than the XLA fallback path's
int8xint8 formulation it replaces.

Layout: q (B, Tq, H, D); k_q/v_q (B, H, Tk, D) int8 HEAD-MAJOR (the
framework's cache layout, models/model.py mha); k_s (B, H, Tk) f32
per-(head, position) scales; v_s (B, H) f32 per-head scales (matching
``models.model.quantize_cross_kv``).  Grid over (B, H) with fully
contiguous per-head blocks; the key axis is padded to a block multiple
with a masked tail.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

try:  # pallas import guarded for minimal CPU environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .attention import use_pallas

_NEG_INF = -1e30
_BLOCK_K = 512  # key positions per inner step


def _xattn_kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, *,
                  scale: float, t_pad: int, t_valid: int):
    """One (batch, head) program: stream int8 K/V blocks, dequant in VMEM,
    online softmax over the (unmasked) key axis."""
    q = q_ref[0, :, 0, :].astype(jnp.float32) * scale   # (Tq, D)
    tq, d = q.shape
    n_blocks = t_pad // _BLOCK_K

    def body(i, carry):
        acc, m_i, l_i = carry
        kq = kq_ref[0, 0, pl.ds(i * _BLOCK_K, _BLOCK_K), :]   # (BK, D) i8
        ks = ks_ref[0, 0, pl.ds(i * _BLOCK_K, _BLOCK_K)]      # (BK,) f32
        k = kq.astype(jnp.float32) * ks[:, None]               # dequant, VMEM
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Tq, BK)
        col = (i * _BLOCK_K
               + lax.broadcasted_iota(jnp.int32, (tq, _BLOCK_K), 1))
        s = jnp.where(col < t_valid, s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_i - m_new)
        l_new = l_i * correction + jnp.sum(p, axis=-1, keepdims=True)
        v = vq_ref[0, 0, pl.ds(i * _BLOCK_K, _BLOCK_K), :].astype(
            jnp.float32)                                       # (BK, D)
        acc = acc * correction + lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((tq, d), jnp.float32)
    m_i = jnp.full((tq, 1), _NEG_INF, jnp.float32)
    l_i = jnp.zeros((tq, 1), jnp.float32)
    acc, m_i, l_i = lax.fori_loop(0, n_blocks, body, (acc, m_i, l_i))

    out = acc / jnp.maximum(l_i, 1e-30)
    o_ref[0, :, 0, :] = (out * vs_ref[0, 0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "t_valid",
                                             "interpret"))
def _xattn_quant(q, k_q, k_s, v_q, v_s, *, scale: float, t_valid: int,
                 interpret: bool = False):
    """q (B, Tq, H, D) bf16; k_q/v_q (B, H, T_pad, D) int8 head-major;
    k_s (B, H, T_pad) f32 (lane-aligned); v_s (B, H) f32
    -> (B, Tq, H, D) f32."""
    b, tq, h, d = q.shape
    t_pad = k_q.shape[2]
    grid = (b, h)

    kernel = functools.partial(_xattn_kernel, scale=scale, t_pad=t_pad,
                               t_valid=t_valid)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, 1, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (i, j),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, 1, d), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tq, h, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * t_pad * d,
            bytes_accessed=(b * h * t_pad * d * 2       # int8 K+V
                            + b * h * t_pad * 4         # k scales
                            + b * tq * h * d * (2 + 4)),
            transcendentals=b * h * tq * t_pad),
        interpret=interpret,
    )(q, k_q, k_s, v_q, v_s)


def cross_attention_quant(q: jax.Array, k_q: jax.Array, k_s: jax.Array,
                          v_q: jax.Array, v_s: jax.Array,
                          *, interpret: bool = False) -> jax.Array:
    """Cross attention against an int8 KV cache.

    q: (B, Tq, H, D); k_q/v_q: (B, H, Tk, D) int8 head-major;
    k_s: (B, H, Tk) f32; v_s: (B, H) f32.  Returns (B, Tq, H, D) float32.

    Pallas (in-VMEM dequant) on TPU; float dequant einsum fallback
    elsewhere — same math: dequantized K/V, f32 softmax/accumulation.
    """
    b, tq, h, d = q.shape
    tk = k_q.shape[2]
    scale = float(1.0 / (d ** 0.5))

    if not (use_pallas() or interpret):
        kf = k_q.astype(jnp.float32) * k_s[..., None]
        vf = v_q.astype(jnp.float32) * v_s[..., None, None]
        s = jnp.einsum("bqhd,bhkd->bhqk", q.astype(jnp.float32), kf,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bqhd", p, vf,
                          preferred_element_type=jnp.float32)

    t_pad = -(-tk // _BLOCK_K) * _BLOCK_K
    if t_pad != tk:
        pad4 = [(0, 0), (0, 0), (0, t_pad - tk), (0, 0)]
        k_q = jnp.pad(k_q, pad4)
        v_q = jnp.pad(v_q, pad4)
        k_s = jnp.pad(k_s, [(0, 0), (0, 0), (0, t_pad - tk)])
    return _xattn_quant(q.astype(jnp.bfloat16), k_q, k_s, v_q, v_s,
                        scale=scale, t_valid=tk, interpret=interpret)
