"""Pallas decode-step attention over merged-head (C, S) caches (TPU).

THE per-token hot loop of Whisper decode is two matvec-shaped attentions
per layer: self-attention over the KV cache and cross-attention over the
precomputed audio KV (reference graph
/root/reference/thirdparty/whisper.cpp/whisper.cpp:2282-2423).  The
reference hand-rolls these as ggml mat-vecs with per-format dot kernels
(ggml-quants.c); the XLA einsum formulation measured only ~25-50% of HBM
peak at decode batch sizes and scales superlinearly in batch (see
docs/SCALING.md).

TPU-first design decisions:

- **Merged-head layout** ``(B, C, S)`` with ``S = n_head * head_dim`` —
  the raw layout the K/V projections produce.  No head-split transpose
  ever happens on the per-step path; the only consumers that need heads
  are the score/weight reductions, done here with a tiny 0/1 *segment
  matrix* ``SEG (S, Hp)`` (``SEG[s, h] = 1`` iff lane ``s`` belongs to
  head ``h``):

      scores(b, c, h) = sum_s (K(b, c, s) * q(b, s)) * SEG[s, h]
      out(b, s)       = sum_c (P @ SEG^T)(b, c, s) * V(b, c, s)

  which computes exact per-head dot products in f32 without ever
  materializing a head axis.  SEG is generated IN-KERNEL from two iotas
  (one compare per program, ~50 ns) — materializing it as a trace-time
  constant embedded 98-327 KB into the clip-loop HLO, which the tunneled
  remote-compile path punishes badly (advisor r3 finding #1).

- **Whole-cache operands + a layer scalar**: the caches enter as the
  full ``(L, B, C, S)`` stacked arrays and the LAYER to read is a
  scalar-prefetch argument consumed by the index maps.  Passing per-layer
  ``(B, C, S)`` slices from inside the layer scan made XLA materialize a
  dynamic-slice COPY of each layer's cache every step (~125 MB/step at
  beam-5/batch-8) — the scan's xs-slicing cannot fuse into a custom
  call.  With the layer riding the index map, the kernel reads HBM
  blocks of the stacked array directly and nothing is ever copied.

- **Batch-tiled blocks**: the grid is ``(B / BT, NC)`` with BT batch
  rows per program (BT sized so each K/V block is ~1.5 MB).  A first
  cut with one program per (batch row, key block) measured slower than
  the XLA einsum — per-program fixed costs dominated the ~1 us of real
  work; tiling B into the block amortizes them ~8x.

- **Blocked keys + online softmax** over the C axis with VMEM scratch
  accumulators, so large-v3 cross attention (C = 1536, S = 1280)
  streams at HBM bandwidth without blowing VMEM.

- **Valid-window masking**, not cache-shaped masks: slot c of row b is
  attended iff ``c < lo[b]  or  split <= c < hi``.  The decode loops
  write prompts at slots [0, n_prompt) and token i at the batch-uniform
  slot ``split + i``, so the mask is two scalar compares — no
  (B, 1, 1, C) mask tensor exists anywhere.

- **Block skipping**: key blocks entirely above ``hi`` are neither
  fetched nor computed — their index_map aliases the last active block
  (scalar-prefetched), so early decode steps read only the live prefix
  of the cache instead of all ``C`` slots.

The jnp fallback (CPU tests, non-TPU) reshapes to heads and runs the
same f32 math; tests/test_decode_attention.py asserts kernel==fallback
in interpret mode.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple


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
_BLOCK_C = 256    # key slots per grid step
_H_PAD = 128      # head axis padded to one lane tile
_BLOCK_BYTES = 3 << 19  # ~1.5 MB per K/V block target


def force_einsum_decode_attn() -> bool:
    """Debug override: GWT_DECODE_ATTN=einsum forces the einsum path.

    The kernel is the architectural default on TPU since the round-4
    carry-resident cache design: the decode loop carries the full
    (L, B, C, S) caches and the kernel reads the current layer through
    its index maps, while the einsum formulation must materialize a
    per-layer dynamic-slice COPY of the cache every step (the very copy
    the design removed — measured ~125 MB/step at beam-5/batch-8).
    Useful only for numerics cross-checks."""
    return os.environ.get("GWT_DECODE_ATTN") == "einsum"


def _pick_bt(b: int, s: int, itemsize: int) -> int:
    """Largest divisor of B keeping a (BT, BLOCK_C, S) block ~1.5 MB."""
    cap = max(_BLOCK_BYTES // (_BLOCK_C * s * itemsize), 1)
    bt = 1
    for d in range(1, b + 1):
        if b % d == 0 and d <= cap:
            bt = d
    return bt


def _seg_t(s: int, n_head: int):
    """In-kernel TRANSPOSED segment matrix (H_PAD, S) bf16:
    SEG_T[h, s] = 1 iff lane s belongs to head h.  Head-major
    orientation so every use broadcasts/contracts along natural axes
    (Mosaic rejects lane-direction vector broadcasts).  Built from two
    iotas so no constant is embedded in the HLO."""
    d = s // n_head
    lane_head = lax.broadcasted_iota(jnp.int32, (_H_PAD, s), 1) // d
    row = lax.broadcasted_iota(jnp.int32, (_H_PAD, s), 0)
    return (lane_head == row).astype(jnp.bfloat16)


def _decode_attn_kernel(scal_ref, lo_ref, q_ref, k_ref, v_ref,
                        o_ref, acc_ref, m_ref, l_ref, *,
                        split: int, n_blocks_max: int, scale: float,
                        bt: int, n_head: int, shared_kv: bool = False):
    """One (b-tile, c-block) step: online-softmax attention for BT
    single-query rows, unrolled per row (all-2D ops).  ``shared_kv``:
    the BT rows are one BEAM GROUP attending a single shared K/V block
    (cross-attention of K beams over one stream's audio — the reference
    shares this through its unified cache, whisper.cpp:2357-2423).

    Per row: q folds into the transposed segment matrix (seg is 0/1, so
    ``seg_q = SEG_T * q_row`` is exactly the bf16 q values) and the
    score "matmul" K @ seg_q^T runs at bf16 MXU rate with f32
    accumulation — numerically identical to the standard bf16 attention
    einsum; the 1/sqrt(D) softmax scale applies to the f32 scores.
    Scratch acc (BT, S), m/l (BT, H_PAD) persist across the c grid
    dimension (TPU grids run sequentially)."""
    c = pl.program_id(1)
    hi = scal_ref[0]
    n_active = jnp.maximum(pl.cdiv(hi, _BLOCK_C), 1)
    s_dim = q_ref.shape[-1]

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(c < n_active)
    def _():
        segt = _seg_t(s_dim, n_head)                      # (HP, S) bf16
        if shared_kv:
            k = k_ref[0, 0].astype(jnp.bfloat16)          # (BC, S)
            v = v_ref[0, 0].astype(jnp.float32)
        slot2 = (c * _BLOCK_C + lax.broadcasted_iota(
            jnp.int32, (_BLOCK_C, _H_PAD), 0))
        for b_ in range(bt):
            if shared_kv:
                q_b = q_ref[0, b_].astype(jnp.bfloat16)   # (S,)
                lo_b = lo_ref[0, b_, 0]
            else:
                k = k_ref[0, b_].astype(jnp.bfloat16)     # (BC, S)
                v = v_ref[0, b_].astype(jnp.float32)
                q_b = q_ref[b_, 0].astype(jnp.bfloat16)
                lo_b = lo_ref[b_, 0, 0]
            seg_q = segt * q_b[None, :]                   # (HP, S)
            s = lax.dot_general(
                k, seg_q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (BC, HP)

            ok = ((slot2 < lo_b)
                  | ((slot2 >= split) & (slot2 < hi)))
            s = jnp.where(ok, s, _NEG_INF)

            m_new = jnp.maximum(m_ref[b_],
                                jnp.max(s, axis=0))       # (HP,)
            p = jnp.exp(s - m_new[None, :])               # (BC, HP)
            corr_h = jnp.exp(m_ref[b_] - m_new)           # (HP,)
            l_ref[b_, :] = l_ref[b_] * corr_h + jnp.sum(p, axis=0)
            m_ref[b_, :] = m_new

            # probs cast to bf16 for the expand matmul — the precision
            # the dense einsum path uses for its probs @ V contraction
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
        # padded head lanes leave zero columns in l_s; the corresponding
        # acc lanes are zero too, so guard the divide
        out = (acc_ref[:] / jnp.maximum(l_s, 1e-30)).astype(o_ref.dtype)
        if shared_kv:
            o_ref[0] = out
        else:
            o_ref[:, 0, :] = out


def _dot32(a, b):
    """EXACT f32 matmul for the softmax bookkeeping (broadcasts,
    selections, normalizers).  TPU f32 matmuls default to bf16-precision
    MXU passes; for a rank-1 broadcast of the running max that turns
    exp(s - m~) into exp(+1e27) = inf on fully-masked lanes (m = -1e30
    reproduced only approximately), and it silently truncates l/corr to
    ~8 mantissa bits everywhere else."""
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


def _decode_attn_group_packed_kernel(
        scal_ref, lo_ref, q_ref, k_ref, v_ref, o_ref,
        acc_ref, m_ref, l_ref, *,
        split: int, n_blocks_max: int, scale: float, kg: int,
        n_head: int, blk_c: int = _BLOCK_C):
    """PACKED beam-group attention: all K beams' heads share one 128-lane
    score tile.

    The per-row unrolled shared_kv branch measured 135 GB/s = 16% of
    roofline (KERNELS_r03) — K serialized small matmuls per block, each
    inflated to the 128-lane head pad (n_head real columns of 128).
    Here the K*n_head (row, head) pairs pack into the sublane axis:

      seg_q[r, s] = q_{r//H}[s] * [s//d == r%H]          (HP, S)
      scores^T    = seg_q @ K_block^T                    (HP, BC) - ONE
                    NT-form dot_general, no physical transpose
      Z          += probs^T @ V_block                    (HP, S)  - ONE

    so the whole group costs two MXU ops per block instead of 3K
    lane-padded ones.  The online softmax runs along LANES (slots);
    sublane-vector (HP, 1) rescales broadcast via rank-1 matmuls with an
    iota-generated ones row (Mosaic rejects lane-direction vector
    broadcasts).  Requires kg * n_head <= 128 (tiny..large-v3 at beam
    5; the unrolled branch remains for wider configs).
    Output row b = sublane-select of Z rows [b*H, (b+1)*H) by head lane.
    """
    c = pl.program_id(1)
    hi = scal_ref[0]
    n_active = jnp.maximum(pl.cdiv(hi, blk_c), 1)
    s_dim = q_ref.shape[-1]
    d = s_dim // n_head
    bc = k_ref.shape[2]

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(c < n_active)
    def _():
        r_s = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 0)
        lane_h = lax.broadcasted_iota(jnp.int32, (_H_PAD, s_dim), 1) // d
        segstack = (lane_h == r_s % n_head).astype(jnp.bfloat16)
        # select matrix rows r -> beam r // n_head (zero past kg*n_head)
        sel = (lax.broadcasted_iota(jnp.int32, (_H_PAD, kg), 0) // n_head
               == lax.broadcasted_iota(jnp.int32, (_H_PAD, kg), 1)
               ).astype(jnp.bfloat16)
        q_g = q_ref[0].astype(jnp.bfloat16)               # (K, S)
        qstack = jnp.dot(sel, q_g,
                         preferred_element_type=jnp.float32)
        seg_q = segstack * qstack.astype(jnp.bfloat16)    # (HP, S) bf16

        k = k_ref[0, 0].astype(jnp.bfloat16)              # (BC, S)
        v = v_ref[0, 0].astype(jnp.bfloat16)
        s_t = lax.dot_general(
            seg_q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (HP, BC)

        lo_col = _dot32(sel.astype(jnp.float32),
                        lo_ref[0].astype(jnp.float32))    # (HP, 1)
        slot = (c * blk_c
                + lax.broadcasted_iota(jnp.int32, (_H_PAD, bc), 1)
                ).astype(jnp.float32)
        ok = (slot < lo_col) | ((slot >= float(split))
                                & (slot < hi.astype(jnp.float32)))
        s_t = jnp.where(ok, s_t, _NEG_INF)

        m_cur = jnp.max(s_t, axis=1, keepdims=True)       # (HP, 1)
        m_new = jnp.maximum(m_ref[:, :1], m_cur)
        # (HP, 1) lane broadcasts are exact vector ops in Mosaic — a
        # rank-1 ones-matmul here runs at bf16 MXU precision and turned
        # exp(s - m~) into inf on fully-masked lanes
        p_t = jnp.exp(s_t - m_new)
        corr = jnp.exp(m_ref[:, :1] - m_new)              # (HP, 1)
        l_ref[:, :1] = (l_ref[:, :1] * corr
                        + jnp.sum(p_t, axis=1, keepdims=True))
        m_ref[:, :1] = m_new
        acc_ref[:] = (acc_ref[:] * corr
                      + lax.dot_general(
                          p_t.astype(jnp.bfloat16), v,
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32))

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


@functools.partial(jax.jit,
                   static_argnames=("split", "n_head", "kv_group",
                                    "interpret"))
def _decode_attn_tpu(q, k, v, lo, scal, *, split: int, n_head: int,
                     kv_group: int = 1, interpret: bool = False):
    """q (B, S); k/v (L, B//kv_group, C, S); scal = [hi, layer] i32."""
    b, s = q.shape
    c_pad = k.shape[2]
    nc = c_pad // _BLOCK_C

    blk_c = _BLOCK_C

    def kv_map(b_i, c_i, scal_ref):
        # alias blocks beyond the live prefix to the last active block:
        # the pipeline re-reads a resident block instead of fetching
        n_active = jnp.maximum(pl.cdiv(scal_ref[0], blk_c), 1)
        return (scal_ref[1], b_i, jnp.minimum(c_i, n_active - 1), 0)

    def row_map(b_i, c_i, scal_ref):
        return (b_i, 0, 0)

    if kv_group > 1:
        # beam groups share one K/V row: grid over (G, NC), q/out/lo
        # blocked (1, K, ...) per group
        g = b // kv_group
        bt = kv_group
        packed = kv_group * n_head <= _H_PAD
        blk_c = 512 if (packed and c_pad % 512 == 0) else _BLOCK_C
        nc = c_pad // blk_c
        if packed:
            kernel = functools.partial(
                _decode_attn_group_packed_kernel, split=split,
                n_blocks_max=nc, kg=bt, n_head=n_head, blk_c=blk_c,
                scale=float(1.0 / ((s // n_head) ** 0.5)))
            scratch = [
                pltpu.VMEM((_H_PAD, s), jnp.float32),
                pltpu.VMEM((_H_PAD, _H_PAD), jnp.float32),
                pltpu.VMEM((_H_PAD, _H_PAD), jnp.float32),
            ]
        else:
            kernel = functools.partial(
                _decode_attn_kernel, split=split, n_blocks_max=nc,
                bt=bt, scale=float(1.0 / ((s // n_head) ** 0.5)),
                n_head=n_head, shared_kv=True)
            scratch = [
                pltpu.VMEM((bt, s), jnp.float32),
                pltpu.VMEM((bt, _H_PAD), jnp.float32),
                pltpu.VMEM((bt, _H_PAD), jnp.float32),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g, nc),
            in_specs=[
                pl.BlockSpec((1, bt, 1), row_map),     # lo (G, K, 1)
                pl.BlockSpec((1, bt, s), row_map),     # q  (G, K, S)
                pl.BlockSpec((1, 1, blk_c, s), kv_map),
                pl.BlockSpec((1, 1, blk_c, s), kv_map),
            ],
            out_specs=pl.BlockSpec((1, bt, s), row_map),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((g, bt, s), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * c_pad * s,
                bytes_accessed=2 * g * c_pad * s * k.dtype.itemsize,
                transcendentals=b * c_pad * _H_PAD),
            interpret=interpret,
        )(scal, lo.reshape(g, bt, 1), q.reshape(g, bt, s), k, v)
        return out.reshape(b, s)

    bt = _pick_bt(b, s, k.dtype.itemsize)
    kernel = functools.partial(_decode_attn_kernel, split=split,
                               n_blocks_max=nc, bt=bt, n_head=n_head,
                               scale=float(1.0 / ((s // n_head) ** 0.5)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,       # scal (2,) = [hi, layer]
        grid=(b // bt, nc),
        in_specs=[
            pl.BlockSpec((bt, 1, 1), row_map),       # lo (B, 1, 1) i32
            pl.BlockSpec((bt, 1, s), row_map),       # q  (B, 1, S)
            pl.BlockSpec((1, bt, _BLOCK_C, s), kv_map),
            pl.BlockSpec((1, bt, _BLOCK_C, s), kv_map),
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
            bytes_accessed=2 * b * c_pad * s * k.dtype.itemsize,
            transcendentals=b * c_pad * _H_PAD),
        interpret=interpret,
    )(scal, lo[:, None, None], q[:, None], k, v)
    return out[:, 0]


def _fallback(q, k, v, lo, hi, split: int, n_head: int,
              kv_group: int = 1):
    """jnp reference path: reshape to heads, masked softmax, f32."""
    b, s = q.shape
    c = k.shape[1]
    d = s // n_head
    scale = 1.0 / (d ** 0.5)
    if kv_group > 1:
        k = jnp.repeat(k, kv_group, axis=0)
        v = jnp.repeat(v, kv_group, axis=0)
    qh = q.reshape(b, n_head, d).astype(jnp.float32) * scale
    kh = k.reshape(b, c, n_head, d).astype(jnp.float32)
    vh = v.reshape(b, c, n_head, d).astype(jnp.float32)
    scores = jnp.einsum("bhd,bchd->bhc", qh, kh)
    slot = jnp.arange(c)[None, None, :]
    ok = ((slot < lo[:, None, None])
          | ((slot >= split) & (slot < jnp.reshape(hi, (1, 1, 1)))))
    scores = jnp.where(ok, scores, _NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhc,bchd->bhd", p, vh)
    return out.reshape(b, s)


def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     lo: jax.Array, hi: jax.Array, *,
                     split: int, n_head: int, kv_group: int = 1,
                     layer=None, interpret: bool = False) -> jax.Array:
    """Single-query attention over a merged-head cache.

    q: (B, S); k/v: (B // kv_group, C, S) — or the full stacked
    (L, B // kv_group, C, S) caches with ``layer`` a traced i32 scalar
    selecting the layer to read (preferred inside layer scans: the index
    maps consume the scalar so no per-layer slice is ever materialized).
    C must be a multiple of 256 (pad with zeros — masked); lo: (B,) i32;
    hi: scalar i32 (traced ok).
    Slot c of row b is valid iff ``c < lo[b] or split <= c < hi``.
    ``kv_group > 1``: consecutive groups of kv_group query rows (beams of
    one stream) share a single K/V row — no materialized repeat.

    Self-attention:  lo = per-row prompt length, split = padded prompt
    capacity, hi = split + step + 1.
    Cross-attention: lo = audio_ctx valid length (per-row or uniform),
    split = C (gap window empty), hi = 0.

    Returns (B, S) float32.
    """
    b, s = q.shape
    if k.ndim == 3:
        k = k[None]
        v = v[None]
        layer = jnp.int32(0) if layer is None else layer
    use_kernel = (use_pallas() or interpret) \
        and not (force_einsum_decode_attn() and not interpret)
    if not use_kernel:
        kl = k[layer] if k.shape[0] != 1 else k[0]
        vl = v[layer] if v.shape[0] != 1 else v[0]
        return _fallback(q, kl, vl, lo, hi, split, n_head,
                         kv_group=kv_group)
    interpret = interpret or os.environ.get("GWT_PALLAS_INTERPRET") == "1"
    lo = jnp.asarray(lo, jnp.int32).reshape(b)
    # hi drives both masking and block skipping; lo-only windows (cross)
    # still need every block up to max(lo) fetched
    hi_eff = jnp.maximum(jnp.asarray(hi, jnp.int32).reshape(()),
                         jnp.max(lo))
    scal = jnp.stack([hi_eff, jnp.asarray(layer, jnp.int32).reshape(())])
    return _decode_attn_tpu(q, k, v, lo, scal,
                            split=split, n_head=n_head,
                            kv_group=kv_group, interpret=interpret)
