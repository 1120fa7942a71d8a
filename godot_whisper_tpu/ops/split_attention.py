"""Split prompt/live beam self-attention (Pallas TPU).

Beam decode self-attention has two regions with different sharing
structure, and storing them in one per-beam cache wastes both bandwidth
and reorder traffic (docs/SCALING.md "batch scaling"):

- the PROMPT slots are identical across the K beams of a group (the
  grouped prompt pass decodes each stream's prompt once and broadcasts,
  decode/window.py) — so they are stored ONCE per group, (L, G, CP, S),
  and read through the 128-lane PACKED group formulation (all K beams'
  heads share one score tile, one NT dot per block — see
  decode_attention._decode_attn_group_packed_kernel);
- the LIVE autoregressive slots differ per beam, (L, B, NL, S), written
  at slot i (no prompt offset, no masked gap) and re-sourced by the
  beam merge with ZERO copying: a (B, NL) row map (permuted at each
  merge) tells the kernel which group row physically holds each beam's
  slot — matching the reference's zero-movement seq_cp re-tag
  (whisper.cpp:5402-5418).

One kernel walks both: the c-grid covers prompt blocks then live
blocks, the online-softmax scratch carries across the phase boundary,
and each phase's OTHER input aliases to a resident block so it is never
fetched.  The live phase computes packed scores with K per-row-masked
NT dots against the same 128-lane tile (k differs per beam there, so
one shared dot is impossible; the masked dots accumulate exactly
because the row masks partition the sublanes).

The reference's analogue is the unified cell cache where prompt cells
carry all beams' seq-ids after kv_cache_seq_cp
(/root/reference/thirdparty/whisper.cpp/whisper.cpp:5277, 2282-2320) —
shared storage by METADATA; here the sharing is structural.

Requires kv_group-compatible packing: ``beam_size * n_head <= 128``
(tiny..large-v3 at beam 5, up to 16 heads at beam 8); the decode loop
falls back to the single-cache path for wider configs.
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
from .decode_attention import (_BLOCK_C, _H_PAD, _NEG_INF, _dot32,
                               _fallback, _seg_t)


def _split_beam_kernel(scal_ref, lo_ref, q_ref, kp_ref, vp_ref, kl_ref,
                       vl_ref, rm_ref, o_ref, acc_ref, m_ref, l_ref, *,
                       ncp: int, n_blocks_max: int, scale: float,
                       kg: int, n_head: int):
    """One (group, c-block) step.  Blocks [0, ncp) read the shared
    prompt cache; blocks [ncp, n_blocks_max) read the per-beam live
    cache THROUGH THE ROW MAP rm (1, K, BC): beam b's live slot t
    physically lives at group row rm[b, t] — the zero-copy beam-merge
    indirection (see split_beam_attention).  scal = [hi_live, layer,
    lo_max]."""
    c = pl.program_id(1)
    hi_live = scal_ref[0]
    s_dim = q_ref.shape[-1]
    d = s_dim // n_head
    bc = kp_ref.shape[2]
    # active blocks: prompt blocks covering [0, lo_max) then live blocks
    # covering [0, hi_live)
    np_act = jnp.maximum(pl.cdiv(scal_ref[2], bc), 1)
    nl_act = jnp.maximum(pl.cdiv(hi_live, bc), 1)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    def seg_q_packed():
        r_s = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 0)
        lane_h = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 1) // d
        segstack = (lane_h == r_s % n_head).astype(jnp.bfloat16)
        sel = (lax.broadcasted_iota(jnp.int32, (_H_PAD, kg), 0) // n_head
               == lax.broadcasted_iota(jnp.int32, (_H_PAD, kg), 1)
               ).astype(jnp.bfloat16)
        qstack = jnp.dot(sel, q_ref[0].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return sel, segstack * qstack.astype(jnp.bfloat16)  # (HP, S)

    def online_update(s_t):
        m_cur = jnp.max(s_t, axis=1, keepdims=True)
        m_new = jnp.maximum(m_ref[:, :1], m_cur)
        p_t = jnp.exp(s_t - m_new)
        corr = jnp.exp(m_ref[:, :1] - m_new)
        l_ref[:, :1] = (l_ref[:, :1] * corr
                        + jnp.sum(p_t, axis=1, keepdims=True))
        m_ref[:, :1] = m_new
        return p_t, corr

    is_prompt = c < ncp

    @pl.when(is_prompt & (c < np_act))
    def _():
        sel, seg_q = seg_q_packed()
        k = kp_ref[0, 0].astype(jnp.bfloat16)             # (BC, S)
        v = vp_ref[0, 0].astype(jnp.bfloat16)
        s_t = lax.dot_general(
            seg_q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (HP, BC)
        lo_col = _dot32(sel.astype(jnp.float32),
                        lo_ref[0].astype(jnp.float32))    # (HP, 1)
        slot = (c * bc
                + lax.broadcasted_iota(jnp.int32, (_H_PAD, bc), 1)
                ).astype(jnp.float32)
        s_t = jnp.where(slot < lo_col, s_t, _NEG_INF)
        p_t, corr = online_update(s_t)
        acc_ref[:] = (acc_ref[:] * corr
                      + lax.dot_general(
                          p_t.astype(jnp.bfloat16), v,
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32))

    @pl.when(~is_prompt & (c - ncp < nl_act))
    def _():
        sel, seg_q = seg_q_packed()
        slot = (c - ncp) * bc + lax.broadcasted_iota(
            jnp.int32, (_H_PAD, bc), 1)
        # row-map expand: rm_e[r, t] = rm[beam(r), t] — which physical
        # group row holds beam(r)'s live slot t.  One exact one-hot
        # matmul (values < kg, exact in any precision).
        rm_e = _dot32(sel.astype(jnp.float32),
                      rm_ref[0].astype(jnp.float32))      # (HP, BC)
        # per-slot source selection: each physical row's full score tile
        # is computed once, then each (beam, slot) cell keeps the tile
        # of its mapped source row.  The masks partition (HP, BC), so
        # the sum is an exact select — same MXU cost as the previous
        # per-beam row-masked dots, plus K cheap VPU selects.
        s_t = None
        z_masks = []
        for b_ in range(kg):
            kb = kl_ref[0, 0, b_].astype(jnp.bfloat16)    # (BC, S)
            part = lax.dot_general(
                seg_q, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (HP, BC)
            m_b = rm_e == float(b_)
            z_masks.append(m_b)
            part = jnp.where(m_b, part, 0.0)
            s_t = part if s_t is None else s_t + part
        s_t = s_t * scale
        s_t = jnp.where(slot < hi_live, s_t, _NEG_INF)
        p_t, corr = online_update(s_t)
        z = None
        for b_ in range(kg):
            vb = vl_ref[0, 0, b_].astype(jnp.bfloat16)
            part = lax.dot_general(
                jnp.where(z_masks[b_], p_t, 0.0).astype(jnp.bfloat16),
                vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = part if z is None else z + part
        acc_ref[:] = acc_ref[:] * corr + z

    @pl.when(c == n_blocks_max - 1)
    def _():
        lv = jnp.maximum(l_ref[:, :1], 1e-30)             # (HP, 1)
        r_s = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 0)
        lane_h = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 1) // d
        rows = []
        for b_ in range(kg):
            e_b = (r_s == b_ * n_head + lane_h).astype(jnp.float32)
            z_b = jnp.sum(acc_ref[:] * e_b, axis=0, keepdims=True)
            d_b = jnp.sum(lv * e_b, axis=0, keepdims=True)
            rows.append(z_b / jnp.maximum(d_b, 1e-30))
        o_ref[0] = jnp.concatenate(rows, axis=0).astype(o_ref.dtype)


def split_beam_attention(q, kp, vp, kl, vl, lo, hi_live, *,
                         n_head: int, kv_group: int, layer=None,
                         rowmap=None, interpret: bool = False):
    """Self-attention over a split prompt/live beam cache.

    q: (B, S) with B = G * kv_group; kp/vp: (L, G, CP, S) shared prompt
    KV; kl/vl: (L, B, NL, S) per-beam live KV; lo: (B,) per-row prompt
    valid length; hi_live: scalar — live slots [0, hi_live) valid;
    ``layer``: traced i32 selecting the layer (required for 4-D inputs).

    ``rowmap`` (B, NL) i32, values in [0, kv_group): the ZERO-COPY beam
    merge — beam b's live slot t physically lives at row
    ``group_base + rowmap[b, t]`` of kl/vl.  The beam merge permutes
    this map (rowmap' = rowmap[src]; rowmap'[:, i] = own row) instead
    of moving cache bytes — the functional twin of the reference's
    kv_cache_seq_cp cell re-tagging (/root/reference/thirdparty/
    whisper.cpp/whisper.cpp:5402-5418), which re-sources beam histories
    with ZERO tensor movement.  None means identity (each beam owns its
    own row — pre-merge semantics).  Returns (B, S) f32.
    """
    b, s = q.shape
    if kp.ndim == 3:
        kp, vp, kl, vl = kp[None], vp[None], kl[None], vl[None]
        layer = jnp.int32(0) if layer is None else layer
    lo = jnp.asarray(lo, jnp.int32).reshape(b)
    nl = kl.shape[2]
    g = b // kv_group
    if rowmap is None:
        rowmap = jnp.broadcast_to(
            (jnp.arange(b, dtype=jnp.int32) % kv_group)[:, None], (b, nl))
    rowmap = jnp.asarray(rowmap, jnp.int32)
    if not (use_pallas() or interpret):
        li = layer if kp.shape[0] != 1 else 0
        kpl, vpl, kll, vll = kp[li], vp[li], kl[li], vl[li]
        # apply the row map: gather each beam's live history from its
        # mapped source rows within the group
        idx = rowmap.reshape(g, kv_group, nl)[..., None]
        kll = jnp.take_along_axis(
            kll.reshape(g, kv_group, nl, s), idx, axis=1
        ).reshape(b, nl, s)
        vll = jnp.take_along_axis(
            vll.reshape(g, kv_group, nl, s), idx, axis=1
        ).reshape(b, nl, s)
        kfull = jnp.concatenate(
            [jnp.repeat(kpl, kv_group, axis=0), kll], axis=1)
        vfull = jnp.concatenate(
            [jnp.repeat(vpl, kv_group, axis=0), vll], axis=1)
        cp = kpl.shape[1]
        return _fallback(q, kfull, vfull, lo,
                         cp + jnp.asarray(hi_live, jnp.int32),
                         cp, n_head)
    interpret = interpret or os.environ.get("GWT_PALLAS_INTERPRET") == "1"
    hi_live = jnp.maximum(jnp.asarray(hi_live, jnp.int32).reshape(()), 0)
    scal = jnp.stack([hi_live,
                      jnp.asarray(layer, jnp.int32).reshape(()),
                      jnp.max(lo)])
    # live cache reshaped so a (1, K, blk, s) block addresses one
    # group's beams: (L, B, NL, S) -> (L, G, K, NL, S) is just a view
    L_, B_, NL_, S_ = kl.shape
    kl5 = kl.reshape(L_, g, kv_group, NL_, S_)
    vl5 = vl.reshape(L_, g, kv_group, NL_, S_)
    return _split_tpu_5d(q, kp, vp, kl5, vl5, lo,
                         rowmap.reshape(g, kv_group, NL_), scal,
                         n_head=n_head, kv_group=kv_group,
                         interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("n_head", "kv_group", "interpret"))
def _split_tpu_5d(q, kp, vp, kl5, vl5, lo, rowmap, scal, *, n_head: int,
                  kv_group: int, interpret: bool = False):
    b, s = q.shape
    g = b // kv_group
    cp = kp.shape[2]
    nl = kl5.shape[3]
    blk = _BLOCK_C
    ncp = cp // blk
    ncl = nl // blk
    nmax = ncp + ncl

    def prompt_map(g_i, c_i, scal_ref):
        np_act = jnp.maximum(pl.cdiv(scal_ref[2], blk), 1)
        return (scal_ref[1], g_i,
                jnp.minimum(jnp.minimum(c_i, np_act - 1), ncp - 1), 0)

    def live_map(g_i, c_i, scal_ref):
        nl_act = jnp.maximum(pl.cdiv(jnp.maximum(scal_ref[0], 1), blk),
                             1)
        cl = jnp.clip(c_i - ncp, 0, None)
        return (scal_ref[1], g_i, 0, jnp.minimum(cl, nl_act - 1), 0)

    def rm_map(g_i, c_i, scal_ref):
        nl_act = jnp.maximum(pl.cdiv(jnp.maximum(scal_ref[0], 1), blk),
                             1)
        cl = jnp.clip(c_i - ncp, 0, None)
        return (g_i, 0, jnp.minimum(cl, nl_act - 1))

    def row_map(g_i, c_i, scal_ref):
        return (g_i, 0, 0)

    kernel = functools.partial(
        _split_beam_kernel, ncp=ncp, n_blocks_max=nmax, kg=kv_group,
        n_head=n_head, scale=float(1.0 / ((s // n_head) ** 0.5)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,     # scal (3,) = [hi_live, layer, lo_max]
        grid=(g, nmax),
        in_specs=[
            pl.BlockSpec((1, kv_group, 1), row_map),    # lo (G, K, 1)
            pl.BlockSpec((1, kv_group, s), row_map),    # q  (G, K, S)
            pl.BlockSpec((1, 1, blk, s), prompt_map),   # kp 4D
            pl.BlockSpec((1, 1, blk, s), prompt_map),   # vp 4D
            pl.BlockSpec((1, 1, kv_group, blk, s), live_map),  # kl 5D
            pl.BlockSpec((1, 1, kv_group, blk, s), live_map),  # vl 5D
            pl.BlockSpec((1, kv_group, blk), rm_map),   # rowmap (G,K,NL)
        ],
        out_specs=pl.BlockSpec((1, kv_group, s), row_map),
        scratch_shapes=[
            pltpu.VMEM((_H_PAD, s), jnp.float32),
            pltpu.VMEM((_H_PAD, _H_PAD), jnp.float32),
            pltpu.VMEM((_H_PAD, _H_PAD), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, kv_group, s), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * (cp + nl) * s,
            bytes_accessed=(2 * g * cp * s + 2 * b * nl * s
                            ) * kp.dtype.itemsize,
            transcendentals=b * (cp + nl) * _H_PAD),
        interpret=interpret,
    )(scal, lo.reshape(g, kv_group, 1), q.reshape(g, kv_group, s),
      kp, vp, kl5, vl5, rowmap)
    return out.reshape(b, s)
