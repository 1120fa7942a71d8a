"""Split prompt/live beam attention (ops/split_attention.py):
kernel == composed single-cache fallback in interpret mode, across
layers, live extents, and ragged per-group prompt lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from godot_whisper_tpu.ops.decode_attention import _fallback
from godot_whisper_tpu.ops.split_attention import split_beam_attention


def _ref(q, kp, vp, kl, vl, lo, hi_live, cp, n_head, kv_group):
    kfull = jnp.concatenate(
        [jnp.repeat(kp, kv_group, axis=0), kl], axis=1)
    vfull = jnp.concatenate(
        [jnp.repeat(vp, kv_group, axis=0), vl], axis=1)
    return _fallback(q, kfull, vfull, lo, jnp.int32(cp + hi_live),
                     cp, n_head)


@pytest.mark.parametrize("hi_live", [0, 1, 7, 130, 256])
def test_split_matches_composed_cache(hi_live):
    rng = np.random.default_rng(0)
    l, g, kgrp, cp, nl, s, h = 2, 3, 5, 256, 256, 384, 6
    b = g * kgrp
    kp = jnp.asarray(rng.standard_normal((l, g, cp, s)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((l, g, cp, s)), jnp.bfloat16)
    kl = jnp.asarray(rng.standard_normal((l, b, nl, s)), jnp.bfloat16)
    vl = jnp.asarray(rng.standard_normal((l, b, nl, s)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, s)), jnp.bfloat16)
    lo = jnp.asarray(np.repeat(rng.integers(5, cp - 20, g), kgrp),
                     jnp.int32)
    for li in range(l):
        got = split_beam_attention(q, kp, vp, kl, vl, lo,
                                   jnp.int32(hi_live), n_head=h,
                                   kv_group=kgrp, layer=jnp.int32(li),
                                   interpret=True)
        want = _ref(q, kp[li], vp[li], kl[li], vl[li], lo, hi_live, cp,
                    h, kgrp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("hi_live", [1, 37, 130])
def test_split_rowmap_rereads_mapped_rows(hi_live):
    """Zero-copy beam merge: with a random row map, beam b's live slot t
    must be read from group row rowmap[b, t] — kernel (interpret) vs a
    manually gathered composed-cache oracle."""
    rng = np.random.default_rng(3)
    l, g, kgrp, cp, nl, s, h = 2, 2, 5, 256, 256, 384, 6
    b = g * kgrp
    kp = jnp.asarray(rng.standard_normal((l, g, cp, s)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((l, g, cp, s)), jnp.bfloat16)
    kl = jnp.asarray(rng.standard_normal((l, b, nl, s)), jnp.bfloat16)
    vl = jnp.asarray(rng.standard_normal((l, b, nl, s)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, s)), jnp.bfloat16)
    lo = jnp.asarray(np.repeat(rng.integers(5, cp - 20, g), kgrp),
                     jnp.int32)
    rowmap = jnp.asarray(rng.integers(0, kgrp, (b, nl)), jnp.int32)
    for li in range(l):
        got = split_beam_attention(q, kp, vp, kl, vl, lo,
                                   jnp.int32(hi_live), n_head=h,
                                   kv_group=kgrp, layer=jnp.int32(li),
                                   rowmap=rowmap, interpret=True)
        # oracle: materialize the per-beam mapped live cache
        kl_m = np.asarray(kl[li], np.float32).reshape(g, kgrp, nl, s)
        vl_m = np.asarray(vl[li], np.float32).reshape(g, kgrp, nl, s)
        rm = np.asarray(rowmap).reshape(g, kgrp, nl)
        kl_g = np.empty((b, nl, s), np.float32)
        vl_g = np.empty((b, nl, s), np.float32)
        for gi in range(g):
            for bi in range(kgrp):
                for t in range(nl):
                    kl_g[gi * kgrp + bi, t] = kl_m[gi, rm[gi, bi, t], t]
                    vl_g[gi * kgrp + bi, t] = vl_m[gi, rm[gi, bi, t], t]
        want = _ref(q, kp[li], vp[li],
                    jnp.asarray(kl_g, jnp.bfloat16),
                    jnp.asarray(vl_g, jnp.bfloat16), lo, hi_live, cp,
                    h, kgrp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_split_rowmap_fallback_path():
    """The non-Pallas fallback applies the same row-map gather."""
    rng = np.random.default_rng(4)
    l, g, kgrp, cp, nl, s, h = 1, 2, 3, 256, 256, 192, 3
    b = g * kgrp
    kp = jnp.asarray(rng.standard_normal((l, g, cp, s)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((l, g, cp, s)), jnp.bfloat16)
    kl = jnp.asarray(rng.standard_normal((l, b, nl, s)), jnp.bfloat16)
    vl = jnp.asarray(rng.standard_normal((l, b, nl, s)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, s)), jnp.bfloat16)
    lo = jnp.full((b,), 60, jnp.int32)
    rowmap = jnp.asarray(rng.integers(0, kgrp, (b, nl)), jnp.int32)
    hi = 50
    got = split_beam_attention(q, kp, vp, kl, vl, lo, jnp.int32(hi),
                               n_head=h, kv_group=kgrp,
                               layer=jnp.int32(0), rowmap=rowmap)
    want = split_beam_attention(q, kp, vp, kl, vl, lo, jnp.int32(hi),
                                n_head=h, kv_group=kgrp,
                                layer=jnp.int32(0), rowmap=rowmap,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_split_garbage_beyond_live_is_masked():
    """Live slots >= hi_live (the reorder's unspecified region) must not
    leak into the softmax: poisoning them with huge values changes
    nothing vs zeroing them."""
    rng = np.random.default_rng(1)
    l, g, kgrp, cp, nl, s, h = 1, 2, 5, 256, 256, 384, 6
    b = g * kgrp
    kp = jnp.asarray(rng.standard_normal((l, g, cp, s)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((l, g, cp, s)), jnp.bfloat16)
    kl = rng.standard_normal((l, b, nl, s)).astype(np.float32)
    vl = rng.standard_normal((l, b, nl, s)).astype(np.float32)
    hi = 40
    kl_poison, vl_poison = kl.copy(), vl.copy()
    kl_poison[:, :, hi:] = 1e4
    vl_poison[:, :, hi:] = -1e4
    q = jnp.asarray(rng.standard_normal((b, s)), jnp.bfloat16)
    lo = jnp.full((b,), 100, jnp.int32)
    got = split_beam_attention(
        q, kp, vp, jnp.asarray(kl_poison, jnp.bfloat16),
        jnp.asarray(vl_poison, jnp.bfloat16), lo, jnp.int32(hi),
        n_head=h, kv_group=kgrp, layer=jnp.int32(0), interpret=True)
    want = _ref(q, kp[0], vp[0], jnp.asarray(kl, jnp.bfloat16)[0],
                jnp.asarray(vl, jnp.bfloat16)[0], lo, hi, cp, h, kgrp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
