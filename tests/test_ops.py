"""Pallas kernel tests (interpreter mode on CPU) against einsum references."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from godot_whisper_tpu.ops import attention


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setenv("GWT_PALLAS_INTERPRET", "1")
    yield
    # jit caches are keyed on traced consts; clear to avoid leaking the
    # interpreter-mode executable into other tests
    attention._flash_bhtd.clear_cache()


def test_flash_attention_matches_einsum(interpret_mode):
    rng = np.random.default_rng(0)
    B, T, H, D = 1, 160, 2, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))

    got = attention.flash_attention(q, k, v)

    scale = 1.0 / np.sqrt(D)
    qs = np.asarray(q).transpose(0, 2, 1, 3)
    ks = np.asarray(k).transpose(0, 2, 1, 3)
    vs = np.asarray(v).transpose(0, 2, 1, 3)
    s = np.einsum("bhqd,bhkd->bhqk", qs, ks) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, vs).transpose(0, 2, 1, 3)

    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_flash_attention_padding_mask(interpret_mode):
    """T not a block multiple: padded keys must not perturb the result."""
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 100, 1, 64
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, T, H, D)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    got = np.asarray(attention.flash_attention(q, k, v))

    os.environ.pop("GWT_PALLAS_INTERPRET", None)
    want = np.asarray(attention.flash_attention(q, k, v))  # einsum path
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_einsum_fallback_on_cpu():
    """Without interpret mode, CPU uses the einsum path and works."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 4, 32)).astype(np.float32))
    out = attention.flash_attention(x, x, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
