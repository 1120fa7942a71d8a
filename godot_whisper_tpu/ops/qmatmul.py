"""Int8 weight-only matmul (W8A16) Pallas kernels + the QuantTensor pytree.

The reference's quantized formats exist for exactly one reason: decode-time
mat-vec work is HBM-bandwidth-bound, so ggml stores weights in 4/5/8-bit
blocks and dequantizes INSIDE the dot-product kernels
(/root/reference/thirdparty/whisper.cpp/ggml-quants.c dot kernels; the
OpenCL path likewise fuses dequant+matmul, ggml-opencl.cpp:889-894,1454).
This module is the TPU-native equivalent: weights stored int8 with
per-output-channel float32 scales, DMA'd from HBM as int8 and upcast in
VMEM right before the MXU contraction — HBM traffic halves vs bfloat16
while compute stays bf16 with f32 accumulation.

Why a kernel at all: expressing this in plain XLA
(``x @ (q.astype(bf16) * s)``) materializes the dequantized bf16 weights in
HBM, so the bandwidth saving never lands (measured slower than bf16 on the
int8 cross-KV einsum path, docs/SCALING.md).  Pallas keeps the upcast in
VMEM where it belongs.

Layouts:
- ``io``: weight (S_in, O_out), scales (O,) — the framework's ``x @ W``
  projection orientation (models/params.py).
- ``oi``: weight (O_out, S_in), scales (O,) — the token-embedding
  orientation (V, S): the same int8 buffer serves the embedding row gather
  AND the logits contraction (per-vocab-row scales factor out of both).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

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


class QuantTensor(NamedTuple):
    """Symmetric per-channel int8 tensor: ``dequant = q * s`` with ``s``
    broadcast along the (single) reduced axis.  A pytree — stacks under
    ``lax.scan``, shards under pjit (parallel/sharding.py mirrors it)."""

    q: jax.Array  # int8, full shape
    s: jax.Array  # float32, q.shape minus the reduced axis

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # dtype of the dequantized value
        return jnp.float32


def reduced_axis(qt: QuantTensor) -> int:
    """Which axis of ``q`` the scales were reduced over (shape diff)."""
    qs, ss = list(qt.q.shape), list(qt.s.shape)
    for i in range(len(qs)):
        if qs[:i] + qs[i + 1:] == ss:
            # ambiguous only when two axes have equal size AND dropping
            # either matches; the convention below always reduces the
            # contraction axis, which quantize_tensor records implicitly
            return i
    raise ValueError(f"scale shape {ss} does not match quant shape {qs}")


def quantize_tensor(w: jax.Array, *, reduce_axis: int) -> QuantTensor:
    """Symmetric absmax int8 quantization, scales per channel of every axis
    except ``reduce_axis`` (the contraction axis of the later matmul)."""
    wf = jnp.asarray(w).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=reduce_axis)
    s = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / jnp.expand_dims(s, reduce_axis)),
                 -127, 127).astype(jnp.int8)
    return QuantTensor(q=q, s=s)


def dequantize(qt: QuantTensor) -> jax.Array:
    return qt.q.astype(jnp.float32) * jnp.expand_dims(
        qt.s, reduced_axis(qt))


# ============================================================ int4 (W4A16) ==
class Quant4Tensor(NamedTuple):
    """Group-wise symmetric int4 tensor for the ``io`` projection layout —
    the TPU-native analogue of ggml's flagship q4_0 role
    (/root/reference/thirdparty/whisper.cpp/ggml-quants.c: 32-element
    blocks with one scale, dequantized inside the dot kernels).

    Logical weight (..., S, O).  Two 4-bit values pack per byte along the
    contraction axis S at GROUP granularity: within group ``g`` (rows
    ``gG..gG+G``), byte row ``r`` holds original row ``gG+r`` in the low
    nibble and ``gG+G/2+r`` in the high nibble, so per-group unpacking is a
    nibble split + concat — no lane interleave on the TPU.  Values are
    stored biased (+8) in [0, 15].

    q: (..., S/2, O) uint8 packed;  s: (..., S/G, O) float32 group scales.
    A pytree: stacks under ``lax.scan``, shards under pjit (q and s ranks
    match the logical weight, so PartitionSpecs mirror 1:1).
    """

    q: jax.Array
    s: jax.Array

    @property
    def group(self) -> int:
        return 2 * self.q.shape[-2] // self.s.shape[-2]

    @property
    def shape(self):
        return (*self.q.shape[:-2], 2 * self.q.shape[-2], self.q.shape[-1])

    @property
    def dtype(self):
        return jnp.float32


def quantize_tensor4(w: jax.Array, *, group: int = 128) -> Quant4Tensor:
    """Symmetric absmax int4 over groups of ``group`` rows of the
    contraction axis (axis -2 of an (..., S, O) weight)."""
    wf = jnp.asarray(w).astype(jnp.float32)
    *lead, S, O = wf.shape
    assert S % group == 0 and group % 2 == 0, (S, group)
    g = wf.reshape(*lead, S // group, group, O)
    absmax = jnp.max(jnp.abs(g), axis=-2)                    # (..., S/G, O)
    s = jnp.maximum(absmax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(g / s[..., None, :]), -8, 7).astype(jnp.int32) + 8
    lo, hi = q[..., :group // 2, :], q[..., group // 2:, :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return Quant4Tensor(q=packed.reshape(*lead, S // 2, O), s=s)


def dequantize4(qt: Quant4Tensor) -> jax.Array:
    *lead, S2, O = qt.q.shape
    n_g = qt.s.shape[-2]
    group = 2 * S2 // n_g
    p = qt.q.reshape(*lead, n_g, group // 2, O).astype(jnp.int32)
    q = jnp.concatenate([p & 0xF, p >> 4], axis=-2) - 8      # (...,n_g,G,O)
    w = q.astype(jnp.float32) * qt.s[..., None, :]
    return w.reshape(*lead, 2 * S2, O)


def _q4mm_kernel(x_ref, w_ref, s_ref, o_ref, *, gm: int, group: int):
    """One (row-block, col-block, group-slab) program: split nibbles +
    rebias in VMEM, contract each G-row slab on the MXU (G=128 fills the
    systolic array's K dimension), scale, accumulate.

    ``gm`` groups ride in ONE weight block: a one-group-per-program
    version measured 85 GB/s — 32 KB weight DMAs are latency-bound —
    while merging the groups into ~1 MB blocks with an unrolled
    static-slice loop reaches 364 GB/s (KERNELS_r04.json), now ahead of
    the int8 path per byte.  Any remaining slabs accumulate over the
    innermost grid dimension into the revisited output block."""
    g = pl.program_id(2)
    acc = None
    for gi in range(gm):
        xg = x_ref[:, gi * group:(gi + 1) * group]
        # int32-domain nibble unpack — NOT a missed optimization: this
        # Mosaic version cannot legalize uint8 vector shifts
        # (arith.shrui on vector<...xi8>) and widens every sub-32-bit
        # int->float convert through i32/f32 internally
        # (lowering._convert_helper), so a "narrow" uint8-domain unpack
        # neither compiles nor would save the widening (r5 attempt).
        wp = w_ref[gi * (group // 2):(gi + 1) * (group // 2)
                   ].astype(jnp.int32)
        w = jnp.concatenate([wp & 0xF, wp >> 4], axis=0) - 8  # (G, BO)
        p = lax.dot_general(xg, w.astype(xg.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        p = p * s_ref[0, gi]                                # (BO,) bcast
        acc = p if acc is None else acc + p

    @pl.when(g == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(g > 0)
    def _acc():
        o_ref[...] += acc


def _pick_gm(n_g: int, group: int, bo: int) -> int:
    """Largest divisor of n_g keeping the packed weight block ~<=1.5 MB."""
    cap = max((3 << 19) // ((group // 2) * bo), 1)
    gm = 1
    for d in range(1, n_g + 1):
        if n_g % d == 0 and d <= cap:
            gm = d
    return gm


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _q4mm_2d(x: jax.Array, q: jax.Array, s: jax.Array, *, group: int,
             interpret: bool = False) -> jax.Array:
    B, S = x.shape
    O = q.shape[-1]
    n_g = S // group
    BO = _pick_bo(S // 2, O)
    BB = _pick_bb(B)
    gm = _pick_gm(n_g, group, BO)
    grid = (pl.cdiv(B, BB), pl.cdiv(O, BO), n_g // gm)
    return pl.pallas_call(
        functools.partial(_q4mm_kernel, gm=gm, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, group * gm), lambda i, j, g: (i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gm * group // 2, BO), lambda i, j, g: (g, j),
                         memory_space=pltpu.VMEM),
            # scales ride with a singleton leading axis reshaped to
            # (n_g/gm, gm, O) so a (1, gm, BO) block satisfies Mosaic's
            # min-tile rule
            pl.BlockSpec((1, gm, BO), lambda i, j, g: (g, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, BO), lambda i, j, g: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * O,
            bytes_accessed=B * S * 2 + S * O // 2 + n_g * O * 4 + B * O * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, q, s.reshape(n_g // gm, gm, O))


def quant_matmul4(x: jax.Array, qt: Quant4Tensor, *,
                  interpret: bool = False) -> jax.Array:
    """``x (..., S) @ Quant4Tensor (S, O) -> (..., O) float32`` — quarter
    the HBM weight traffic of bf16.  Pallas in-VMEM unpack+dequant on TPU;
    elsewhere a per-group einsum with identical numerics to the kernel
    (bf16 INTEGER weight values into the dot, f32 group scales applied to
    the f32 partial products — never a bf16 round of q*s)."""
    *lead, S = x.shape
    O = qt.q.shape[-1]
    xb = x.astype(jnp.bfloat16).reshape(-1, S)
    if use_pallas() or interpret:
        y = _q4mm_2d(xb, qt.q, qt.s, group=qt.group, interpret=interpret)
    else:
        group = qt.group
        n_g = S // group
        p = qt.q.reshape(n_g, group // 2, O).astype(jnp.int32)
        w = jnp.concatenate([p & 0xF, p >> 4], axis=1) - 8   # (n_g, G, O)
        # f32 dot over bf16-rounded x and exact integer weights: bit-equal
        # to the kernel's bf16xbf16->f32 MXU contraction (bf16 values are
        # exact in f32), and CPU backends lack a bf16 batched-dot thunk
        part = jnp.einsum("bgk,gko->bgo",
                          xb.astype(jnp.float32).reshape(-1, n_g, group),
                          w.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        y = jnp.sum(part * qt.s[None], axis=1)               # f32 scales
    return y.reshape(*lead, O)


# ================================================================== kernel ==
def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, *, oi: bool):
    """One (row-block, col-block) program: upcast the int8 weight block in
    VMEM, contract on the MXU, scale columns."""
    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)        # int8 -> bf16, VPU, in VMEM
    dims = (((1,), (1,)), ((), ())) if oi else (((1,), (0,)), ((), ()))
    acc = lax.dot_general(x, w, dims, preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[...]          # (1, BO) broadcasts over rows


def _pick_bo(S: int, O: int) -> int:
    """Column-block size: keep the int8 weight block ~<=2 MB (double
    buffered), lane-aligned."""
    bo = max(128, (2 * 1024 * 1024 // max(S, 1)) // 128 * 128)
    return min(bo, 512, max(128, -(-O // 128) * 128))


def _pick_bb(B: int) -> int:
    return min(max(16, -(-B // 16) * 16), 256)


@functools.partial(jax.jit, static_argnames=("oi", "interpret"))
def _qmm_2d(x: jax.Array, q: jax.Array, s: jax.Array, *, oi: bool,
            interpret: bool = False) -> jax.Array:
    """(B, S) @ int8 weight -> (B, O) f32.  Grid over (row, col) blocks;
    partial edge blocks are handled by Pallas masking."""
    B, S = x.shape
    O = q.shape[0] if oi else q.shape[1]
    BO = _pick_bo(S, O)
    BB = _pick_bb(B)
    grid = (pl.cdiv(B, BB), pl.cdiv(O, BO))

    w_spec = (pl.BlockSpec((BO, S), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM) if oi else
              pl.BlockSpec((S, BO), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_qmm_kernel, oi=oi),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, S), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, BO), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, BO), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * O,
            bytes_accessed=B * S * 2 + S * O + B * O * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, q, s.reshape(1, O))


def quant_matmul(x: jax.Array, qt: QuantTensor, *, layout: str = "io",
                 interpret: bool = False) -> jax.Array:
    """``x (..., S) @ QuantTensor -> (..., O) float32``.

    layout "io": qt.q (S, O), scales (O,).  layout "oi": qt.q (O, S),
    scales (O,).  Pallas on TPU; dequant-einsum fallback elsewhere (same
    numerics: bf16 x, bf16-upcast weights, f32 accumulation, f32 scale).
    """
    assert layout in ("io", "oi")
    oi = layout == "oi"
    O = qt.q.shape[0] if oi else qt.q.shape[1]
    lead = x.shape[:-1]
    S = x.shape[-1]
    xb = x.astype(jnp.bfloat16).reshape(-1, S)

    if use_pallas() or interpret:
        y = _qmm_2d(xb, qt.q, qt.s, oi=oi, interpret=interpret)
    else:
        w = qt.q.astype(jnp.bfloat16)
        dims = (((1,), (1,)), ((), ())) if oi else (((1,), (0,)), ((), ()))
        y = lax.dot_general(xb, w, dims,
                            preferred_element_type=jnp.float32)
        y = y * qt.s[None, :]
    return y.reshape(*lead, O)
