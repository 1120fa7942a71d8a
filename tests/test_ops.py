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
    attention._flash_bthd.clear_cache()


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
def _xattn_oracle_merged(q, k_q, k_s, v_q, v_s, n_head, t_valid):
    """Float oracle on the merged-head layout: q (B, S); k_q/v_q
    (B, T, S) int8; k_s (B, T, HP); v_s (B, HP); softmax in f64."""
    B, S = q.shape
    T = k_q.shape[1]
    D = S // n_head
    out = np.zeros((B, S))
    for b in range(B):
        for h in range(n_head):
            sl = slice(h * D, (h + 1) * D)
            kf = k_q[b, :, sl].astype(np.float64) * \
                k_s[b, :, h].astype(np.float64)[:, None]
            vf = v_q[b, :, sl].astype(np.float64) * float(v_s[b, h])
            sc = kf @ q[b, sl].astype(np.float64) / np.sqrt(D)
            sc[t_valid:] = -np.inf
            p = np.exp(sc - sc[:t_valid].max())
            p /= p.sum()
            out[b, sl] = p @ vf
    return out


def _make_quant_kv_merged(rng, B, T, n_head, D, HP=128):
    """Merged-layout quantized KV matching models.model.quantize_cross_kv
    (scales padded to the kernel head tile)."""
    S = n_head * D
    kf = rng.standard_normal((B, T, n_head, D)).astype(np.float32)
    vf = rng.standard_normal((B, T, n_head, D)).astype(np.float32)
    k_s = np.abs(kf).max(-1) / 127.0 + 1e-9           # (B, T, H)
    k_q = np.clip(np.round(kf / k_s[..., None]), -127,
                  127).astype(np.int8).reshape(B, T, S)
    v_s = np.abs(vf).max(axis=(1, 3)) / 127.0 + 1e-9  # (B, H)
    v_q = np.clip(np.round(vf / v_s[:, None, :, None]), -127,
                  127).astype(np.int8).reshape(B, T, S)
    k_sp = np.zeros((B, T, HP), np.float32); k_sp[..., :n_head] = k_s
    v_sp = np.zeros((B, HP), np.float32); v_sp[:, :n_head] = v_s
    return k_q, k_sp, v_q, v_sp


@pytest.mark.parametrize("w8a8", [False, True])
def test_cross_attention_quant_kernel(interpret_mode, w8a8):
    """Pallas int8 cross-attention (interpret) vs the float oracle,
    t_valid not a block multiple (masked tail).  Covers BOTH contraction
    modes: exact (int8 KV upcast, bf16 dots) and W8A8 (q/probs
    quantized in-kernel, int8 MXU dots — adds <=~1% quant error)."""
    from godot_whisper_tpu.ops import cross_attention

    rng = np.random.default_rng(7)
    B, T_pad, t_valid, H, D = 2, 512, 300, 6, 64
    S = H * D
    q = rng.standard_normal((B, S)).astype(np.float32)
    k_q, k_s, v_q, v_s = _make_quant_kv_merged(rng, B, T_pad, H, D)

    got = np.asarray(cross_attention.cross_attention_quant(
        jnp.asarray(q), jnp.asarray(k_q),
        jnp.asarray(k_s).astype(jnp.bfloat16),
        jnp.asarray(v_q), jnp.asarray(v_s), n_head=H,
        t_valid=jnp.full((B,), t_valid, jnp.int32), interpret=True,
        w8a8=w8a8))
    want = _xattn_oracle_merged(q, k_q, k_s, v_q, v_s, H, t_valid)
    # bf16 scales + f32 accumulate vs f64 oracle (+ activation
    # quantization in w8a8 mode)
    tol = 3e-2 if w8a8 else 2e-2
    np.testing.assert_allclose(got, want, atol=tol, rtol=tol)


@pytest.mark.parametrize("kg,H,D,T_pad,t_valid,L,layer", [
    # packed (kg*H=30 <= 128) + blk_c=512 variant (T_pad % 512 == 0)
    (5, 6, 64, 512, 300, 1, None),
    # packed + blk_c=256 variant (T_pad % 512 != 0)
    (5, 6, 64, 256, 200, 1, None),
    # WIDE unrolled shared_kv fallback (kg*H=160 > 128)
    (5, 32, 16, 256, 100, 1, None),
    # 4-D stacked caches + traced layer scalar (packed)
    (5, 6, 64, 512, 300, 3, 1),
])
def test_cross_attention_quant_grouped(interpret_mode, kg, H, D, T_pad,
                                       t_valid, L, layer):
    """Grouped int8 cross-attention (advisor r4 finding #3): the packed
    128-lane kernel, the 512-block variant, the wide unrolled shared_kv
    branch and the layer-scalar path vs the float oracle.  G beam groups
    of kg rows share one K/V row each."""
    from godot_whisper_tpu.ops import cross_attention

    rng = np.random.default_rng(11)
    G = 2
    B = G * kg
    S = H * D
    q = rng.standard_normal((B, S)).astype(np.float32)
    per_layer = [_make_quant_kv_merged(rng, G, T_pad, H, D)
                 for _ in range(L)]
    k_q, k_s, v_q, v_s = (np.stack([pl_[i] for pl_ in per_layer])
                          for i in range(4))
    li = 0 if layer is None else layer
    args = ((jnp.asarray(k_q[li]), jnp.asarray(k_s[li]).astype(
        jnp.bfloat16), jnp.asarray(v_q[li]), jnp.asarray(v_s[li]))
        if L == 1 else
        (jnp.asarray(k_q), jnp.asarray(k_s).astype(jnp.bfloat16),
         jnp.asarray(v_q), jnp.asarray(v_s)))
    for w8a8 in (False, True):   # both packed contraction modes
        got = np.asarray(cross_attention.cross_attention_quant(
            jnp.asarray(q), *args, n_head=H,
            t_valid=jnp.full((B,), t_valid, jnp.int32), kv_group=kg,
            layer=None if L == 1 else jnp.int32(layer), interpret=True,
            w8a8=w8a8))
        rep = np.repeat
        want = _xattn_oracle_merged(
            q, rep(k_q[li], kg, axis=0), rep(k_s[li], kg, axis=0),
            rep(v_q[li], kg, axis=0), rep(v_s[li], kg, axis=0), H,
            t_valid)
        tol = 3e-2 if w8a8 else 2e-2
        np.testing.assert_allclose(got, want, atol=tol, rtol=tol)


def test_cross_attention_quant_fallback_matches_oracle():
    """CPU fallback path (float dequant + shared jnp fallback) vs the
    oracle."""
    from godot_whisper_tpu.ops import cross_attention

    rng = np.random.default_rng(8)
    B, T_pad, t_valid, H, D = 1, 256, 64, 3, 32
    S = H * D
    q = rng.standard_normal((B, S)).astype(np.float32)
    k_q, k_s, v_q, v_s = _make_quant_kv_merged(rng, B, T_pad, H, D)

    got = np.asarray(cross_attention.cross_attention_quant(
        jnp.asarray(q), jnp.asarray(k_q),
        jnp.asarray(k_s).astype(jnp.bfloat16),
        jnp.asarray(v_q), jnp.asarray(v_s), n_head=H,
        t_valid=jnp.full((B,), t_valid, jnp.int32)))
    want = _xattn_oracle_merged(q, k_q.astype(np.float32),
                                np.asarray(jnp.asarray(k_s).astype(
                                    jnp.bfloat16).astype(jnp.float32)),
                                v_q, v_s, H, t_valid)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_encoder_head_major_matches_merged(interpret_mode):
    """The head-major encoder attention path (projection-folded
    transposes + (BH, T, D) flash kernel) must match the merged-layout
    einsum path."""
    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.models.model import encoder_forward
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=1, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, 256, 80)), jnp.float32)

    os.environ["GWT_ENC_ATTN"] = "flash"   # head-major (B*H=16 >= min)
    try:
        got = encoder_forward(params, cfg, mel, audio_ctx=128)
    finally:
        os.environ.pop("GWT_ENC_ATTN", None)
    os.environ.pop("GWT_PALLAS_INTERPRET", None)
    want = encoder_forward(params, cfg, mel, audio_ctx=128)  # einsum path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3, rtol=5e-3)


def test_encoder_pad_native_matches_einsum(interpret_mode):
    """PAD-NATIVE encoder mode (residual stream padded once to the
    512-block, per-layer kernels run at T_pad with key masking) must
    match the unpadded einsum path on the valid rows.  audio_ctx=500
    pads to 512 (2.4%-style waste, inside the engage threshold)."""
    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.models.model import encoder_forward
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=1, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, 1000, 80)), jnp.float32)

    os.environ["GWT_ENC_ATTN"] = "flash"
    try:
        got = encoder_forward(params, cfg, mel, audio_ctx=500)
    finally:
        os.environ.pop("GWT_ENC_ATTN", None)
    os.environ.pop("GWT_PALLAS_INTERPRET", None)
    want = encoder_forward(params, cfg, mel, audio_ctx=500)  # einsum path
    assert got.shape == want.shape == (4, 500, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3, rtol=5e-3)
