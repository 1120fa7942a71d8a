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
