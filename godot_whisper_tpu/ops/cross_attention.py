"""Pallas cross-attention decode kernel over int8 KV, merged-head layout.

The int8 sibling of ops/decode_attention.py: large-model decode is
HBM-bandwidth-bound and the cross-attention KV is its largest per-step
read (L*T*S * 2 tensors — ~245 MB bf16 per stream for large-v3).  The
reference amortizes the cross K/V *projections* across steps
(/root/reference/thirdparty/whisper.cpp/whisper.cpp:2005-2074) but still
streams full-precision K/V through every decode step's mat-vecs
(whisper.cpp:2357-2423); its quant machinery (ggml-quants.c dot kernels)
exists for exactly this traffic.  Storing the cache int8 halves it — but
only if the upcast happens on-chip: a plain-XLA dequant einsum
materializes float copies in HBM and measured slower than bf16.

Same structure as ops/decode_attention.py (segment-matrix head
reduction, batch-tiled key blocks, online softmax, grid (B/BT, NC)),
plus:
- K dequant folds into the scores AFTER the segment matmul:
  ``scores(c,h) = (sum_s kq(c,s)*q(s)*SEG[s,h]) * k_s(c,h)`` — exact,
  since within a head column every element shares the (c,h) scale;
- V's per-head scale folds into the final normalization.

Scales ride pre-padded to the 128-lane head tile
(models/model.quantize_cross_kv): k_s (B, T_pad, 128) bf16,
v_s (B, 128) f32 — zero lanes beyond n_head contribute nothing.
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
from .decode_attention import (_BLOCK_C, _H_PAD, _NEG_INF,
                               _fallback, _pick_bt, _segment_matrix)


def _xattn_q_kernel(hi_ref, lo_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                    segt_ref, o_ref, acc_ref, m_ref, l_ref, *,
                    n_blocks_max: int, scale: float, bt: int):
    """Per-row unrolled int8 cross-attention block (all-2D ops — see
    decode_attention._decode_attn_kernel for the structure rationale).
    q folds into the transposed segment matrix; int8 K upcasts exactly
    to bf16 for the score matmul; the per-(position, head) K scales
    apply to the f32 scores, V's per-head scale at normalization."""
    c = pl.program_id(1)
    n_active = jnp.maximum(pl.cdiv(hi_ref[0], _BLOCK_C), 1)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(c < n_active)
    def _():
        segt = segt_ref[:]                                # (HP, S) bf16
        slot2 = (c * _BLOCK_C + lax.broadcasted_iota(
            jnp.int32, (_BLOCK_C, _H_PAD), 0))
        for b_ in range(bt):
            kq = kq_ref[b_].astype(jnp.bfloat16)          # (BC, S) exact
            v = vq_ref[b_].astype(jnp.float32)            # (BC, S)
            q_b = q_ref[b_, 0].astype(jnp.bfloat16)       # (S,)
            lo_b = lo_ref[b_, 0, 0]
            seg_q = segt * q_b[None, :]                   # (HP, S)
            s = lax.dot_general(
                kq, seg_q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (BC, HP)
            s = s * ks_ref[b_].astype(jnp.float32)        # dequant scores

            s = jnp.where(slot2 < lo_b, s, _NEG_INF)

            m_new = jnp.maximum(m_ref[b_], jnp.max(s, axis=0))
            p = jnp.exp(s - m_new[None, :])               # (BC, HP)
            corr_h = jnp.exp(m_ref[b_] - m_new)
            l_ref[b_, :] = l_ref[b_] * corr_h + jnp.sum(p, axis=0)
            m_ref[b_, :] = m_new

            p_s = jnp.dot(p.astype(jnp.bfloat16), segt,
                          preferred_element_type=jnp.float32)  # (BC, S)
            corr_s = jnp.dot(corr_h[None, :].astype(jnp.float32),
                             segt.astype(jnp.float32),
                             preferred_element_type=jnp.float32)[0]
            acc_ref[b_, :] = (acc_ref[b_] * corr_s
                              + jnp.sum(p_s * v, axis=0))

    @pl.when(c == n_blocks_max - 1)
    def _():
        segt_f = segt_ref[:].astype(jnp.float32)
        l_s = jnp.dot(jnp.maximum(l_ref[:], 1e-30), segt_f,
                      preferred_element_type=jnp.float32)  # (BT, S)
        vs_s = jnp.dot(vs_ref[:, 0, :], segt_f,
                       preferred_element_type=jnp.float32)  # (BT, S)
        o_ref[:, 0, :] = (acc_ref[:] / jnp.maximum(l_s, 1e-30) * vs_s
                          ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def _xattn_q_tpu(q, k_q, k_s, v_q, v_s, lo, hi, seg, *, n_head: int,
                 interpret: bool = False):
    b, s = q.shape
    c_pad = k_q.shape[1]
    nc = c_pad // _BLOCK_C
    bt = _pick_bt(b, s, 1)
    kernel = functools.partial(
        _xattn_q_kernel, n_blocks_max=nc, bt=bt,
        scale=float(1.0 / ((s // n_head) ** 0.5)))

    def kv_map(b_i, c_i, hi_ref):
        n_active = jnp.maximum(pl.cdiv(hi_ref[0], _BLOCK_C), 1)
        return (b_i, jnp.minimum(c_i, n_active - 1), 0)

    def row_map(b_i, c_i, hi_ref):
        return (b_i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,       # hi (1,)
        grid=(b // bt, nc),
        in_specs=[
            pl.BlockSpec((bt, 1, 1), row_map),        # lo (B, 1, 1)
            pl.BlockSpec((bt, 1, s), row_map),        # q  (B, 1, S)
            pl.BlockSpec((bt, _BLOCK_C, s), kv_map),
            pl.BlockSpec((bt, _BLOCK_C, _H_PAD), kv_map),
            pl.BlockSpec((bt, _BLOCK_C, s), kv_map),
            pl.BlockSpec((bt, 1, _H_PAD), row_map),   # v_s (B, 1, HP)
            pl.BlockSpec((_H_PAD, s), lambda b_i, c_i, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, 1, s), row_map),
        scratch_shapes=[
            pltpu.VMEM((bt, s), jnp.float32),
            pltpu.VMEM((bt, _H_PAD), jnp.float32),
            pltpu.VMEM((bt, _H_PAD), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, s), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * c_pad * s,
            bytes_accessed=b * c_pad * (2 * s + 2 * _H_PAD),
            transcendentals=b * c_pad * _H_PAD),
        interpret=interpret,
    )(hi, lo[:, None, None], q[:, None], k_q, k_s, v_q, v_s[:, None],
      seg)
    return out[:, 0]


def cross_attention_quant(q: jax.Array, k_q: jax.Array, k_s: jax.Array,
                          v_q: jax.Array, v_s: jax.Array, *,
                          n_head: int, t_valid: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Single-query cross attention against int8 merged-head KV.

    q: (B, S); k_q/v_q: (B, T_pad, S) int8; k_s: (B, T_pad, 128) bf16;
    v_s: (B, 128) f32; t_valid: (B,) i32 valid audio positions.
    Returns (B, S) float32.  Pallas in-VMEM dequant on TPU; float dequant
    + the shared jnp fallback elsewhere (same f32 math).
    """
    b, s = q.shape
    t_pad = k_q.shape[1]
    lo = jnp.asarray(t_valid, jnp.int32).reshape(b)
    if not (use_pallas() or interpret):
        d = s // n_head
        kf = (k_q.astype(jnp.float32).reshape(b, t_pad, n_head, d)
              * k_s[..., :n_head].astype(jnp.float32)[..., None]
              ).reshape(b, t_pad, s)
        vf = (v_q.astype(jnp.float32).reshape(b, t_pad, n_head, d)
              * v_s[:, None, :n_head, None]).reshape(b, t_pad, s)
        return _fallback(q, kf, vf, lo, jnp.int32(0), t_pad, n_head)
    interpret = interpret or os.environ.get("GWT_PALLAS_INTERPRET") == "1"
    seg = jnp.asarray(_segment_matrix(s, n_head))
    hi = jnp.max(lo).reshape(1)   # block-skip bound (uniform)
    return _xattn_q_tpu(q, k_q, k_s, v_q, v_s, lo, hi, seg,
                        n_head=n_head, interpret=interpret)
