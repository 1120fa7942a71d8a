"""Bounded beam-reorder of the self-KV cache (Pallas TPU).

Beam merge must re-source each row's cache history from its selected
parent (the reference re-tags cell metadata with kv_cache_seq_cp — ZERO
tensor movement, /root/reference/thirdparty/whisper.cpp/whisper.cpp:
1008-1054, 5402-5418).  A functional cache cannot re-tag, but it does not
have to copy the whole (L, B, C, S) cache either:

- slots >= hi are DEAD (rewritten by the next decoder_step's
  dynamic_update_slice, or masked) — their post-reorder contents are
  unspecified;
- slots < the prompt pad are IDENTICAL across the beams of a group,
  but skipping them requires preserving them in the output, and the
  ping-pong alt-buffer scheme that enables that measured SLOWER in-loop
  (decode/window.py notes why), so the copy covers [0, hi).

The full ``jnp.take`` gather measured ~1.4 ms per token step inside the
beam loop at tiny/beam-5/batch-8 (C = 512); this kernel runs the same
step at ~0.5 ms by copying only ``ceil(hi/RB)`` blocks with the DMA
engine alone:

- the caches enter viewed as ``(L, B*C, S)`` — merging two leading dims
  keeps the (8, 128) tile order, so the reshape is free, unlike a
  (C*S) lane-flatten which retiles (measured: it materialized full
  copies and OOM'd at large-v3 sizes);
- the GATHER LIVES IN THE INDEX MAP: the input block for output row j,
  slot-block c is ``src[j]*NC + c`` (``src`` scalar-prefetched to SMEM),
  so the pipeline's own DMA fetches the parent's slots and the kernel
  body is a bare block copy.  Two earlier formulations — B unrolled
  dynamic-index VMEM row copies, and a one-hot MXU matmul over
  lane-flattened blocks — measured 10-40x slower than the DMA they
  replaced;
- the slot-block grid dimension is DYNAMIC: dead blocks are never
  fetched, computed, or written.

Contract: ``k_out[l, j, c] == k[l, src[j], c]`` for ``c < hi``;
``c >= hi`` is unspecified.  The jnp fallback (CPU) is the full-batch
take.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas import guarded for minimal CPU environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .attention import use_pallas

_BLOCK_BYTES = 1 << 20  # ~1 MB per (L, RB, S) block


def _pick_rb(l: int, c: int, s: int, itemsize: int) -> int:
    rb = 8
    while rb < 128 and rb * 2 <= c and l * rb * 2 * s * itemsize <= _BLOCK_BYTES:
        rb *= 2
    return rb


def _copy_kernel(scal_ref, k_ref, v_ref, ok_ref, ov_ref):
    # scal = [n_live_blocks, src...]; the one grid step at c == n_live
    # (present only when a dead block exists) writes ZEROS instead of
    # copying — the first dead block of every row must hold finite
    # values because attention's p@V contraction multiplies it by the
    # masked (exactly-0) probabilities, and 0 * garbage-NaN = NaN
    # (uninitialized HBM in a fresh output buffer can hold any bits).
    c = pl.program_id(1)
    is_dead = c >= scal_ref[0]
    ok_ref[...] = jnp.where(is_dead, 0, k_ref[...])
    ov_ref[...] = jnp.where(is_dead, 0, v_ref[...])


@functools.partial(jax.jit, static_argnames=("rb", "interpret"))
def _reorder_tpu(kf, vf, scal, n_grid, *, rb: int,
                 interpret: bool = False):
    """Copy live blocks [0, scal[0]) of every row, gathered by
    src = scal[1:], into fresh buffers; zero-fill one trailing dead
    block per row when capacity allows.  All (L, B*C, S) flat views."""
    l, bc, s = kf.shape
    b = scal.shape[0] - 1
    nc_row = (bc // b) // rb

    def in_map(j, c_i, scal_ref):
        # dead block: alias the row's block 0 (resident, never fetched
        # fresh) — its contents are ignored by the zero-fill write
        c_src = jnp.where(c_i >= scal_ref[0], 0, c_i)
        return (0, scal_ref[1 + j] * nc_row + c_src, 0)

    def out_map(j, c_i, scal_ref):
        return (0, j * nc_row + c_i, 0)

    spec_in = pl.BlockSpec((l, rb, s), in_map)
    spec_out = pl.BlockSpec((l, rb, s), out_map)
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,        # scal (1 + B,)
            grid=(b, n_grid[0]),
            in_specs=[spec_in, spec_in],
            out_specs=[spec_out, spec_out],
        ),
        out_shape=[jax.ShapeDtypeStruct(kf.shape, kf.dtype),
                   jax.ShapeDtypeStruct(vf.shape, vf.dtype)],
        interpret=interpret,
    )(scal, kf, vf)


def reorder_kv_live(k: jax.Array, v: jax.Array, src: jax.Array,
                    hi: jax.Array, *, interpret: bool = False):
    """Gather rows ``src`` of the (L, B, C, S) caches over slots
    [0, hi).  Slots >= hi of the result are UNSPECIFIED — callers must
    overwrite or mask them (the decode loop does: every future slot is
    written by ``dynamic_update_slice`` before its first read, and
    attention masks at ``hi``).  Returns (k', v').
    """
    if (use_pallas() or interpret) and _HAS_PALLAS:
        interpret = (interpret
                     or os.environ.get("GWT_PALLAS_INTERPRET") == "1")
        l, b, c, s = k.shape
        rb = _pick_rb(l, c, s, k.dtype.itemsize)
        hi = jnp.asarray(hi, jnp.int32)
        src = jnp.asarray(src, jnp.int32)
        kf = k.reshape(l, b * c, s)
        vf = v.reshape(l, b * c, s)
        n_blocks = jnp.clip(-(-hi // rb), 1, c // rb)
        # extra grid steps zero-fill the dead blocks up to the NEXT
        # 256-slot attention-block boundary past hi+1 (the next step
        # writes slot hi then attends [0, hi+2)): the decode kernels
        # fetch whole 256-blocks and their p@V contraction multiplies
        # masked slots' V by exactly-0 probabilities — fine for finite
        # garbage, NaN-poisoning for uninitialized HBM bit patterns
        ab = max(256 // rb, 1)   # reorder blocks per attention block
        cover = -(-(hi + 2) // 256) * ab
        n_grid = jnp.clip(jnp.maximum(n_blocks, cover), 1,
                          c // rb).reshape(1)
        scal = jnp.concatenate([n_blocks.reshape(1), src])
        ko, vo = _reorder_tpu(kf, vf, scal, n_grid, rb=rb,
                              interpret=interpret)
        return ko.reshape(k.shape), vo.reshape(v.shape)
    return jnp.take(k, src, axis=1), jnp.take(v, src, axis=1)
