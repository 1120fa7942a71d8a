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
