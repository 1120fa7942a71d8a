"""Bounded beam KV reorder (ops/kv_reorder.py): kernel == full take on
the live prefix, garbage contract beyond hi, shape sweep."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from godot_whisper_tpu.ops.kv_reorder import reorder_kv_live


@pytest.mark.parametrize("l,b,c,s,hi", [
    (2, 10, 256, 128, 50),    # partial live prefix
    (4, 40, 512, 384, 300),   # tiny beam-5 x batch-8 geometry
    (2, 5, 256, 384, 256),    # full cache
    (3, 6, 256, 256, 1),      # degenerate: at least one block copies
])
def test_reorder_matches_take_on_live_prefix(l, b, c, s, hi):
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((l, b, c, s)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((l, b, c, s)), jnp.bfloat16)
    src = jnp.asarray(rng.integers(0, b, b), jnp.int32)
    ko, vo = reorder_kv_live(k, v, src, jnp.int32(hi), interpret=True)
    kr = jnp.take(k, src, axis=1)
    vr = jnp.take(v, src, axis=1)
    assert bool(jnp.all(ko[:, :, :hi] == kr[:, :, :hi]))
    assert bool(jnp.all(vo[:, :, :hi] == vr[:, :, :hi]))


def test_reorder_zero_fills_dead_blocks_to_attention_boundary():
    """Slots [hi_rounded, next-256-boundary) of the output must be
    EXACTLY zero (not uninitialized): the decode attention kernels fetch
    whole 256-slot blocks and their p@V contraction multiplies masked
    slots' V by 0 — finite garbage survives that, NaN bit patterns from
    recycled HBM do not (advisor r4 finding #1)."""
    rng = np.random.default_rng(2)
    l, b, c, s, hi = 2, 8, 1024, 128, 100
    k = jnp.asarray(rng.standard_normal((l, b, c, s)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((l, b, c, s)), jnp.bfloat16)
    src = jnp.asarray(rng.integers(0, b, b), jnp.int32)
    ko, vo = reorder_kv_live(k, v, src, jnp.int32(hi), interpret=True)
    # live prefix still correct
    kr = jnp.take(k, src, axis=1)
    assert bool(jnp.all(ko[:, :, :hi] == kr[:, :, :hi]))
    # coverage through the attention block containing hi+1 is defined:
    # the copy covers rb-rounded hi (rb=128 here -> [0, 128)); the
    # zero-fill must reach the 256-slot attention boundary
    bound = -(-(hi + 2) // 256) * 256     # = 256
    rb_hi = 128                           # copied region end
    assert bool(jnp.all(vo[:, :, rb_hi:bound] == 0))
    assert bool(jnp.all(ko[:, :, rb_hi:bound] == 0))


def test_reorder_duplicated_and_identity_sources():
    """Beam merges frequently pick the same parent for several rows and
    identity for dead rows — both must replicate exactly."""
    rng = np.random.default_rng(1)
    l, b, c, s = 2, 6, 256, 128
    k = jnp.asarray(rng.standard_normal((l, b, c, s)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((l, b, c, s)), jnp.bfloat16)
    src = jnp.asarray([0, 0, 0, 3, 4, 5], jnp.int32)
    ko, vo = reorder_kv_live(k, v, src, jnp.int32(80), interpret=True)
    for j, p in enumerate([0, 0, 0, 3, 4, 5]):
        assert bool(jnp.all(ko[:, j, :80] == k[:, p, :80]))
        assert bool(jnp.all(vo[:, j, :80] == v[:, p, :80]))
