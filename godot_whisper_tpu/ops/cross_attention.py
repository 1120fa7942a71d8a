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
reduction built in-kernel from iotas, batch-tiled key blocks, online
softmax, whole-(L,B,T,S) operands with the layer in the index maps so
layer scans never materialize per-layer slices), plus:
- K dequant folds into the scores AFTER the segment matmul:
  ``scores(c,h) = (sum_s kq(c,s)*q(s)*SEG[s,h]) * k_s(c,h)`` — exact,
  since within a head column every element shares the (c,h) scale;
- V's per-head scale folds into the final normalization.

Scales ride pre-padded to the 128-lane head tile
(models/model.quantize_cross_kv): k_s (L, B, T_pad, 128) bf16,
v_s (L, B, 128) f32 — zero lanes beyond n_head contribute nothing.
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

from .attention import use_pallas
from .decode_attention import (_BLOCK_C, _H_PAD, _NEG_INF, _dot32,
                               _fallback, _pick_bt, _seg_t)


def _xattn_q_kernel(scal_ref, lo_ref, q_ref, kq_ref, ks_ref, vq_ref,
                    vs_ref, o_ref, acc_ref, m_ref, l_ref, *,
                    n_blocks_max: int, scale: float, bt: int,
                    n_head: int, shared_kv: bool = False):
    """Per-row unrolled int8 cross-attention block (all-2D ops — see
    decode_attention._decode_attn_kernel for the structure rationale).
    q folds into the transposed segment matrix; int8 K upcasts exactly
    to bf16 for the score matmul; the per-(position, head) K scales
    apply to the f32 scores, V's per-head scale at normalization.
    ``shared_kv``: the BT rows are one beam group attending a single
    shared int8 K/V row — replaces the materialized jnp.repeat per beam
    (advisor r3 finding #2)."""
    c = pl.program_id(1)
    n_active = jnp.maximum(pl.cdiv(scal_ref[0], _BLOCK_C), 1)
    s_dim = q_ref.shape[-1]

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(c < n_active)
    def _():
        segt = _seg_t(s_dim, n_head)                      # (HP, S) bf16
        slot2 = (c * _BLOCK_C + lax.broadcasted_iota(
            jnp.int32, (_BLOCK_C, _H_PAD), 0))
        if shared_kv:
            kq = kq_ref[0, 0].astype(jnp.bfloat16)        # (BC, S) exact
            v = vq_ref[0, 0].astype(jnp.float32)
            ks = ks_ref[0, 0].astype(jnp.float32)
        for b_ in range(bt):
            if shared_kv:
                q_b = q_ref[0, b_].astype(jnp.bfloat16)   # (S,)
                lo_b = lo_ref[0, b_, 0]
            else:
                kq = kq_ref[0, b_].astype(jnp.bfloat16)   # (BC, S) exact
                v = vq_ref[0, b_].astype(jnp.float32)     # (BC, S)
                ks = ks_ref[0, b_].astype(jnp.float32)
                q_b = q_ref[b_, 0].astype(jnp.bfloat16)   # (S,)
                lo_b = lo_ref[b_, 0, 0]
            seg_q = segt * q_b[None, :]                   # (HP, S)
            s = lax.dot_general(
                kq, seg_q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (BC, HP)
            s = s * ks                                    # dequant scores

            s = jnp.where(slot2 < lo_b, s, _NEG_INF)

            m_new = jnp.maximum(m_ref[b_], jnp.max(s, axis=0))
            p = jnp.exp(s - m_new[None, :])               # (BC, HP)
            corr_h = jnp.exp(m_ref[b_] - m_new)
            l_ref[b_, :] = l_ref[b_] * corr_h + jnp.sum(p, axis=0)
            m_ref[b_, :] = m_new

            p_s = jnp.dot(p.astype(jnp.bfloat16), segt,
                          preferred_element_type=jnp.float32)  # (BC, S)
            corr_s = _dot32(corr_h[None, :].astype(jnp.float32),
                            segt.astype(jnp.float32))[0]
            acc_ref[b_, :] = (acc_ref[b_] * corr_s
                              + jnp.sum(p_s * v, axis=0))

    @pl.when(c == n_blocks_max - 1)
    def _():
        segt_f = _seg_t(s_dim, n_head).astype(jnp.float32)
        l_s = _dot32(jnp.maximum(l_ref[:], 1e-30), segt_f)  # (BT, S)
        if shared_kv:
            vs_s = _dot32(vs_ref[0, 0].astype(jnp.float32),
                          segt_f)                         # (1, S)
            out = acc_ref[:] / jnp.maximum(l_s, 1e-30) * vs_s
            o_ref[0] = out.astype(o_ref.dtype)
        else:
            vs_s = _dot32(vs_ref[0, :, 0, :].astype(jnp.float32),
                          segt_f)                         # (BT, S)
            o_ref[:, 0, :] = (acc_ref[:] / jnp.maximum(l_s, 1e-30) * vs_s
                              ).astype(o_ref.dtype)


def _xattn_q_group_packed_kernel(
        scal_ref, lo_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref,
        acc_ref, m_ref, l_ref, qi_ref, qs_ref, *,
        n_blocks_max: int, scale: float, kg: int, n_head: int,
        blk_c: int = _BLOCK_C, w8a8: bool = False):
    """PACKED int8 beam-group cross attention (see
    decode_attention._decode_attn_group_packed_kernel for the packing
    scheme).  int8 K/V upcast exactly to bf16; the per-(position, head)
    K scales select into a (HP, BC) tile with one NT dot against an
    iota-generated head-select matrix; V's per-head scale applies at the
    final per-row select.

    ``w8a8`` (r5): the ACTIVATIONS quantize too — q per (row, head) and
    probs at a fixed 127 — so both contractions run as int8 x int8 ->
    int32 MXU dots (measured 2.5x the bf16 dot rate on v5e, exact
    integer accumulation) and the int8 K/V blocks are never upcast (the
    int8->bf16 vector convert widens through i32/f32 inside Mosaic and
    bounded the exact kernel at ~0.47 roofline).  Adds <=0.8% relative
    quantization error to scores and probs — the same band as the bf16
    probs rounding of the float kernels — and is only reachable through
    the already-lossy opt-in cross_kv_int8 mode."""
    c = pl.program_id(1)
    n_active = jnp.maximum(pl.cdiv(scal_ref[0], blk_c), 1)
    s_dim = q_ref.shape[-1]
    d = s_dim // n_head
    bc = kq_ref.shape[2]

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        if w8a8:
            # per-(row, head) dynamic q quantization, ONCE per program
            # row (scratch-resident across c blocks — recomputing it per
            # block measured the whole int8-dot saving away): row r of
            # seg_q holds head r%H of beam r//H, one scale per sublane
            r_s = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 0)
            lane_h = (lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 1)
                      // d)
            seg01 = (lane_h == r_s % n_head)
            sel = (lax.broadcasted_iota(jnp.int32, (_H_PAD, kg), 0)
                   // n_head
                   == lax.broadcasted_iota(jnp.int32, (_H_PAD, kg), 1)
                   ).astype(jnp.bfloat16)
            qstack = jnp.dot(sel, q_ref[0].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            seg_q_f = jnp.where(seg01, qstack, 0.0)       # (HP, S) f32
            qs = (jnp.maximum(jnp.max(jnp.abs(seg_q_f), axis=1,
                                      keepdims=True), 1e-20)
                  / 127.0)                                 # (HP, 1)
            qi_ref[:] = jnp.round(seg_q_f / qs).astype(jnp.int8)
            qs_ref[:, :1] = qs

    @pl.when(c < n_active)
    def _():
        r_s = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 0)
        lane_h = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 1) // d
        segstack = (lane_h == r_s % n_head).astype(jnp.bfloat16)
        sel = (lax.broadcasted_iota(jnp.int32, (_H_PAD, kg), 0) // n_head
               == lax.broadcasted_iota(jnp.int32, (_H_PAD, kg), 1)
               ).astype(jnp.bfloat16)
        if w8a8:
            s_i = lax.dot_general(
                qi_ref[:], kq_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)          # (HP, BC)
            s_t = s_i.astype(jnp.float32) * (qs_ref[:, :1] * scale)
        else:
            qstack = jnp.dot(sel, q_ref[0].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            seg_q = segstack * qstack.astype(jnp.bfloat16)  # (HP, S) bf16
            kq = kq_ref[0, 0].astype(jnp.bfloat16)          # exact int8
            s_t = lax.dot_general(
                seg_q, kq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (HP, BC)
        # head-select of the per-(slot, head) K scales -> (HP, BC)
        e_h = (lax.broadcasted_iota(jnp.int32, (_H_PAD, _H_PAD), 1)
               == lax.broadcasted_iota(jnp.int32, (_H_PAD, _H_PAD), 0)
               % n_head).astype(jnp.float32)
        ks_t = lax.dot_general(
            e_h, ks_ref[0, 0].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)           # (HP, BC)
        s_t = s_t * ks_t

        lo_col = _dot32(sel.astype(jnp.float32),
                        lo_ref[0].astype(jnp.float32))    # (HP, 1)
        slot = (c * blk_c
                + lax.broadcasted_iota(jnp.int32, (_H_PAD, bc), 1)
                ).astype(jnp.float32)
        s_t = jnp.where(slot < lo_col, s_t, _NEG_INF)

        m_cur = jnp.max(s_t, axis=1, keepdims=True)
        m_new = jnp.maximum(m_ref[:, :1], m_cur)
        # (HP, 1) lane broadcasts are exact vector ops in Mosaic (see
        # decode_attention packed kernel)
        p_t = jnp.exp(s_t - m_new)
        corr = jnp.exp(m_ref[:, :1] - m_new)
        l_ref[:, :1] = (l_ref[:, :1] * corr
                        + jnp.sum(p_t, axis=1, keepdims=True))
        m_ref[:, :1] = m_new
        if w8a8:
            # probs in [0, 1] quantize at a FIXED 127 scale (the block
            # max is exactly 1 after the online-softmax shift), so the
            # expand contraction is an int8 x int8 -> int32 dot too and
            # V is never upcast
            p_q = jnp.round(p_t * 127.0).astype(jnp.int8)
            pv = lax.dot_general(
                p_q, vq_ref[0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_ref[:] = (acc_ref[:] * corr
                          + pv.astype(jnp.float32) * (1.0 / 127.0))
        else:
            v = vq_ref[0, 0].astype(jnp.bfloat16)          # exact int8
            acc_ref[:] = (acc_ref[:] * corr
                          + lax.dot_general(
                              p_t.astype(jnp.bfloat16), v,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))

    @pl.when(c == n_blocks_max - 1)
    def _():
        segt_f = _seg_t(s_dim, n_head).astype(jnp.float32)
        vs_row = jnp.dot(vs_ref[0, 0].astype(jnp.float32), segt_f,
                         preferred_element_type=jnp.float32)  # (1, S)
        lv = jnp.maximum(l_ref[:, :1], 1e-30)             # (HP, 1)
        r_s = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 0)
        lane_h = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 1) // d
        rows = []
        for b_ in range(kg):
            e_b = (r_s == b_ * n_head + lane_h).astype(jnp.float32)
            z_b = jnp.sum(acc_ref[:] * e_b, axis=0, keepdims=True)
            d_b = jnp.sum(lv * e_b, axis=0, keepdims=True)
            rows.append(z_b / jnp.maximum(d_b, 1e-30) * vs_row)
        o_ref[0] = jnp.concatenate(rows, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "kv_group",
                                             "interpret", "w8a8"))
def _xattn_q_tpu(q, k_q, k_s, v_q, v_s, lo, scal, *, n_head: int,
                 kv_group: int = 1, interpret: bool = False,
                 w8a8: bool = True):
    b, s = q.shape
    c_pad = k_q.shape[2]
    nc = c_pad // _BLOCK_C
    blk_c = _BLOCK_C

    def kv_map(b_i, c_i, scal_ref):
        n_active = jnp.maximum(pl.cdiv(scal_ref[0], blk_c), 1)
        return (scal_ref[1], b_i, jnp.minimum(c_i, n_active - 1), 0)

    def row_map(b_i, c_i, scal_ref):
        return (b_i, 0, 0)

    def vs_map(b_i, c_i, scal_ref):
        return (scal_ref[1], b_i, 0, 0)

    packed1 = kv_group == 1 and n_head <= _H_PAD
    if kv_group > 1 or packed1:
        # beam groups share one int8 K/V row: grid (G, NC), q/lo/out
        # blocked (1, K, ...) per group (see decode_attention).  The
        # kv_group == 1 (greedy) case routes through the SAME packed
        # kernel with groups of one row: the per-row unrolled variant's
        # elementwise p_s*v accumulate and int8->f32 upcasts are VPU
        # work that fits under the f16 kernel's DMA time but BECOMES the
        # bound once int8 halves the bytes (measured 391 GB/s vs f16's
        # 708 at large-v3 b8, KERNELS r5); the packed form runs both
        # contractions on the MXU.
        g = b // kv_group
        bt = kv_group
        packed = kv_group * n_head <= _H_PAD
        if packed and c_pad % 512 == 0:
            blk_c = 512
            nc = c_pad // blk_c
        if packed:
            kernel = functools.partial(
                _xattn_q_group_packed_kernel, n_blocks_max=nc, kg=bt,
                n_head=n_head, blk_c=blk_c, w8a8=w8a8,
                scale=float(1.0 / ((s // n_head) ** 0.5)))
            scratch = [
                pltpu.VMEM((_H_PAD, s), jnp.float32),
                pltpu.VMEM((_H_PAD, _H_PAD), jnp.float32),
                pltpu.VMEM((_H_PAD, _H_PAD), jnp.float32),
                pltpu.VMEM((_H_PAD, s), jnp.int8),      # qi (w8a8)
                pltpu.VMEM((_H_PAD, _H_PAD), jnp.float32),  # qs (w8a8)
            ]
        else:
            kernel = functools.partial(
                _xattn_q_kernel, n_blocks_max=nc, bt=bt, n_head=n_head,
                scale=float(1.0 / ((s // n_head) ** 0.5)),
                shared_kv=True)
            scratch = [
                pltpu.VMEM((bt, s), jnp.float32),
                pltpu.VMEM((bt, _H_PAD), jnp.float32),
                pltpu.VMEM((bt, _H_PAD), jnp.float32),
            ]

        def grow_map(b_i, c_i, scal_ref):
            return (b_i, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # scal (2,) = [hi, layer]
            grid=(g, nc),
            in_specs=[
                pl.BlockSpec((1, bt, 1), grow_map),      # lo (G, K, 1)
                pl.BlockSpec((1, bt, s), grow_map),      # q  (G, K, S)
                pl.BlockSpec((1, 1, blk_c, s), kv_map),
                pl.BlockSpec((1, 1, blk_c, _H_PAD), kv_map),
                pl.BlockSpec((1, 1, blk_c, s), kv_map),
                pl.BlockSpec((1, 1, 1, _H_PAD), vs_map),
            ],
            out_specs=pl.BlockSpec((1, bt, s), grow_map),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((g, bt, s), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * c_pad * s,
                bytes_accessed=g * c_pad * (2 * s + 2 * _H_PAD),
                transcendentals=b * c_pad * _H_PAD),
            interpret=interpret,
        )(scal, lo.reshape(g, bt, 1), q.reshape(g, bt, s), k_q, k_s,
          v_q, v_s[:, :, None])
        return out.reshape(b, s)

    bt = _pick_bt(b, s, 1)
    kernel = functools.partial(
        _xattn_q_kernel, n_blocks_max=nc, bt=bt, n_head=n_head,
        scale=float(1.0 / ((s // n_head) ** 0.5)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,       # scal (2,) = [hi, layer]
        grid=(b // bt, nc),
        in_specs=[
            pl.BlockSpec((bt, 1, 1), row_map),           # lo (B, 1, 1)
            pl.BlockSpec((bt, 1, s), row_map),           # q  (B, 1, S)
            pl.BlockSpec((1, bt, _BLOCK_C, s), kv_map),
            pl.BlockSpec((1, bt, _BLOCK_C, _H_PAD), kv_map),
            pl.BlockSpec((1, bt, _BLOCK_C, s), kv_map),
            pl.BlockSpec((1, bt, 1, _H_PAD), vs_map),    # v_s
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
    )(scal, lo[:, None, None], q[:, None], k_q, k_s, v_q,
      v_s[:, :, None])
    return out[:, 0]


def w8a8_default() -> bool:
    """W8A8 int8-MXU contraction mode for the packed quant kernels —
    default ON (it is what makes cross_kv_int8 actually outrun f16;
    docs/SCALING.md r5); GWT_XATTN_EXACT=1 forces the exact
    int8-KV/bf16-activation contraction for numerics bisection."""
    return os.environ.get("GWT_XATTN_EXACT") != "1"


def cross_attention_quant(q: jax.Array, k_q: jax.Array, k_s: jax.Array,
                          v_q: jax.Array, v_s: jax.Array, *,
                          n_head: int, t_valid: jax.Array,
                          kv_group: int = 1, layer=None,
                          interpret: bool = False,
                          w8a8: Optional[bool] = None) -> jax.Array:
    """Single-query cross attention against int8 merged-head KV.

    q: (B, S); k_q/v_q: (B // kv_group, T_pad, S) int8 — or the stacked
    (L, B // kv_group, T_pad, S) with ``layer`` a traced i32 scalar (see
    decode_attention); k_s: (.., T_pad, 128) bf16; v_s: (.., 128) f32;
    t_valid: (B,) i32 valid audio positions.  ``kv_group > 1``:
    consecutive groups of kv_group query rows (beams of one stream)
    share a single K/V row — no materialized repeat.
    Returns (B, S) float32.  Pallas in-VMEM dequant on TPU; float dequant
    + the shared jnp fallback elsewhere (same f32 math).
    """
    b, s = q.shape
    if k_q.ndim == 3:
        k_q, k_s, v_q = k_q[None], k_s[None], v_q[None]
        v_s = v_s[None]
        layer = jnp.int32(0) if layer is None else layer
    t_pad = k_q.shape[2]
    lo = jnp.asarray(t_valid, jnp.int32).reshape(b)
    if not (use_pallas() or interpret):
        d = s // n_head
        li = layer if k_q.shape[0] != 1 else 0
        kql, ksl, vql, vsl = k_q[li], k_s[li], v_q[li], v_s[li]
        bk = kql.shape[0]
        kf = (kql.astype(jnp.float32).reshape(bk, t_pad, n_head, d)
              * ksl[..., :n_head].astype(jnp.float32)[..., None]
              ).reshape(bk, t_pad, s)
        vf = (vql.astype(jnp.float32).reshape(bk, t_pad, n_head, d)
              * vsl[:, None, :n_head, None]).reshape(bk, t_pad, s)
        return _fallback(q, kf, vf, lo, jnp.int32(0), t_pad, n_head,
                         kv_group=kv_group)
    interpret = interpret or os.environ.get("GWT_PALLAS_INTERPRET") == "1"
    hi = jnp.max(lo).reshape(())   # block-skip bound (uniform)
    scal = jnp.stack([hi, jnp.asarray(layer, jnp.int32).reshape(())])
    return _xattn_q_tpu(q, k_q, k_s, v_q, v_s, lo, scal,
                        n_head=n_head, kv_group=kv_group,
                        interpret=interpret,
                        w8a8=w8a8_default() if w8a8 is None else w8a8)
