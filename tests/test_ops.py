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


# ---------------------------------------------------------- cross-attn int8 --
def _xattn_oracle(q, k_q, k_s, v_q, v_s):
    """Float oracle: dequantize head-major KV, dense attention
    (f64 softmax).  k_q/v_q (B, H, Tk, D); k_s (B, H, Tk); v_s (B, H)."""
    D = q.shape[-1]
    kf = k_q.astype(np.float64) * k_s[..., None]
    vf = v_q.astype(np.float64) * v_s[..., None, None]
    s = np.einsum("bqhd,bhkd->bhqk", q.astype(np.float64), kf) / np.sqrt(D)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bqhd", p, vf)


def _make_quant_kv(rng, B, Tk, H, D):
    """Head-major quantized KV matching models.model.quantize_cross_kv."""
    kf = rng.standard_normal((B, H, Tk, D)).astype(np.float32)
    vf = rng.standard_normal((B, H, Tk, D)).astype(np.float32)
    k_s = np.abs(kf).max(-1) / 127.0 + 1e-9
    k_q = np.clip(np.round(kf / k_s[..., None]), -127, 127).astype(np.int8)
    v_s = np.abs(vf).max(axis=(2, 3)) / 127.0 + 1e-9
    v_q = np.clip(np.round(vf / v_s[..., None, None]),
                  -127, 127).astype(np.int8)
    return k_q, k_s.astype(np.float32), v_q, v_s.astype(np.float32)


def test_cross_attention_quant_kernel(interpret_mode):
    """Pallas int8 cross-attention (interpret) vs the float oracle,
    Tk not a block multiple (masked tail)."""
    from godot_whisper_tpu.ops import cross_attention

    rng = np.random.default_rng(7)
    B, Tq, Tk, H, D = 2, 3, 300, 2, 64
    q = rng.standard_normal((B, Tq, H, D)).astype(np.float32)
    k_q, k_s, v_q, v_s = _make_quant_kv(rng, B, Tk, H, D)

    got = np.asarray(cross_attention.cross_attention_quant(
        jnp.asarray(q), jnp.asarray(k_q), jnp.asarray(k_s),
        jnp.asarray(v_q), jnp.asarray(v_s), interpret=True))
    want = _xattn_oracle(q, k_q, k_s, v_q, v_s)
    # bf16 q + f32 accumulate vs f64 oracle
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    cross_attention._xattn_quant.clear_cache()


def test_cross_attention_quant_fallback_matches_oracle():
    """CPU fallback path (float dequant einsum) vs the oracle."""
    from godot_whisper_tpu.ops import cross_attention

    rng = np.random.default_rng(8)
    B, Tq, Tk, H, D = 1, 1, 64, 3, 32
    q = rng.standard_normal((B, Tq, H, D)).astype(np.float32)
    k_q, k_s, v_q, v_s = _make_quant_kv(rng, B, Tk, H, D)

    got = np.asarray(cross_attention.cross_attention_quant(
        jnp.asarray(q), jnp.asarray(k_q), jnp.asarray(k_s),
        jnp.asarray(v_q), jnp.asarray(v_s)))
    want = _xattn_oracle(q, k_q, k_s, v_q, v_s)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
