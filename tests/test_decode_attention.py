"""Kernel==fallback parity for the merged-head decode-attention kernel
(ops/decode_attention.py) in Pallas interpret mode, plus fallback
correctness vs a plain per-head einsum oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from godot_whisper_tpu.ops.decode_attention import (_fallback,
                                                    decode_attention)


def _oracle(q, k, v, lo, hi, split, n_head):
    b, s = q.shape
    c = k.shape[1]
    d = s // n_head
    out = np.zeros((b, s), np.float32)
    qf = np.asarray(q, np.float64).reshape(b, n_head, d) / np.sqrt(d)
    kf = np.asarray(k, np.float64).reshape(b, c, n_head, d)
    vf = np.asarray(v, np.float64).reshape(b, c, n_head, d)
    for bi in range(b):
        ok = np.array([(ci < lo[bi]) or (split <= ci < hi)
                       for ci in range(c)])
        for h in range(n_head):
            sc = kf[bi, :, h] @ qf[bi, h]
            sc[~ok] = -np.inf
            p = np.exp(sc - sc.max())
            p = p / p.sum()
            out[bi, h * d:(h + 1) * d] = p @ vf[bi, :, h]
    return out


@pytest.mark.parametrize("b,c,s,n_head,split", [
    (2, 256, 384, 6, 232),     # tiny self-attn shape
    (3, 512, 384, 6, 240),     # two blocks
    (2, 512, 1280, 20, 256),   # large-v3-ish
])
def test_kernel_matches_fallback(b, c, s, n_head, split):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, c, s)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, c, s)).astype(np.float32))
    lo = jnp.asarray(rng.integers(1, min(split, 40), (b,)), jnp.int32)
    hi = jnp.int32(min(split + 17, c))

    want = _fallback(q, k, v, lo, hi, split, n_head)
    got = decode_attention(q, k, v, lo, hi, split=split, n_head=n_head,
                           interpret=True)
    # kernel computes q*K products in bf16 (f32 accumulate) — the same
    # precision the production bf16 einsum path sees; the fallback here
    # keeps f32 inputs, so tolerance is bf16-level
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_fallback_matches_oracle():
    rng = np.random.default_rng(1)
    b, c, s, n_head, split = 2, 256, 384, 6, 128
    q = rng.standard_normal((b, s)).astype(np.float32)
    k = rng.standard_normal((b, c, s)).astype(np.float32)
    v = rng.standard_normal((b, c, s)).astype(np.float32)
    lo = np.asarray([5, 33], np.int32)
    hi = 150
    want = _oracle(q, k, v, lo, hi, split, n_head)
    got = _fallback(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                    jnp.asarray(lo), jnp.int32(hi), split, n_head)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_cross_mode_lo_only():
    """Cross-attention call shape: lo = valid length, empty upper window
    (split = C, hi = 0) — padding slots must not leak into the softmax."""
    rng = np.random.default_rng(2)
    b, c, s, n_head = 2, 512, 384, 6
    t_valid = 300
    q = rng.standard_normal((b, s)).astype(np.float32)
    k = rng.standard_normal((b, c, s)).astype(np.float32)
    v = rng.standard_normal((b, c, s)).astype(np.float32)
    # poison the padding region: must be fully masked
    k[:, t_valid:] = 100.0
    v[:, t_valid:] = -100.0
    lo = np.full((b,), t_valid, np.int32)
    want = _oracle(q, k, v, lo, 0, c, n_head)
    got = decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(lo), jnp.int32(0), split=c,
                           n_head=n_head, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)


def test_block_skip_ignores_tail_blocks():
    """Blocks beyond hi are aliased away — garbage there cannot affect
    the result."""
    rng = np.random.default_rng(3)
    b, c, s, n_head, split = 2, 1024, 384, 6, 8
    q = rng.standard_normal((b, s)).astype(np.float32)
    k = rng.standard_normal((b, c, s)).astype(np.float32)
    v = rng.standard_normal((b, c, s)).astype(np.float32)
    lo = np.full((b,), 8, np.int32)
    hi = 40   # only block 0 active out of 4
    k2 = k.copy(); k2[:, 256:] = np.nan
    v2 = v.copy(); v2[:, 256:] = np.nan
    want = decode_attention(jnp.asarray(q), jnp.asarray(k),
                            jnp.asarray(v), jnp.asarray(lo), jnp.int32(hi),
                            split=split, n_head=n_head, interpret=True)
    got = decode_attention(jnp.asarray(q), jnp.asarray(k2),
                           jnp.asarray(v2), jnp.asarray(lo), jnp.int32(hi),
                           split=split, n_head=n_head, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_kernel_grouped_kv():
    """kv_group > 1: K beam rows share one K/V row — kernel == fallback."""
    rng = np.random.default_rng(4)
    g, kgrp, c, s, n_head = 3, 5, 512, 384, 6
    b = g * kgrp
    q = jnp.asarray(rng.standard_normal((b, s)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((g, c, s)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((g, c, s)).astype(np.float32))
    lo = jnp.asarray(rng.integers(1, 30, (b,)), jnp.int32)
    hi = jnp.int32(270)
    split = 232
    want = _fallback(q, k, v, lo, hi, split, n_head, kv_group=kgrp)
    got = decode_attention(q, k, v, lo, hi, split=split, n_head=n_head,
                           kv_group=kgrp, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_kernel_4d_layer_scalar():
    """Whole-(L, B, C, S) operands with a traced layer scalar must match
    the per-layer fallback at every layer (the layer-scan read path —
    no per-layer slice is ever materialized on TPU)."""
    rng = np.random.default_rng(5)
    l, b, c, s, n_head, split = 3, 2, 256, 384, 6, 64
    k = jnp.asarray(rng.standard_normal((l, b, c, s)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((l, b, c, s)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, s)).astype(np.float32))
    lo = jnp.asarray([5, 30], jnp.int32)
    hi = jnp.int32(100)
    for li in range(l):
        want = _fallback(q, k[li], v[li], lo, hi, split, n_head)
        got = decode_attention(q, k, v, lo, hi, split=split,
                               n_head=n_head, layer=jnp.int32(li),
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_kernel_grouped_wide_falls_back_to_unrolled():
    """kv_group * n_head > 128 (e.g. large-v3 beam-8) uses the unrolled
    shared-KV branch; results still match the fallback."""
    rng = np.random.default_rng(6)
    g, kgrp, c, s, n_head = 1, 8, 256, 1280, 20
    b = g * kgrp
    q = jnp.asarray(rng.standard_normal((b, s)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((g, c, s)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((g, c, s)).astype(np.float32))
    lo = jnp.full((b,), 200, jnp.int32)
    want = _fallback(q, k, v, lo, jnp.int32(0), c, n_head, kv_group=kgrp)
    got = decode_attention(q, k, v, lo, jnp.int32(0), split=c,
                           n_head=n_head, kv_group=kgrp, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
