"""Model forward-pass tests: shapes, KV-cache semantics, and numerical parity
against transformers' Whisper (torch CPU) with shared random weights."""

import numpy as np
import pytest

import jax.numpy as jnp

from godot_whisper_tpu.models.config import get_config
from godot_whisper_tpu.models.model import (cross_kv, decoder_dense,
                                            decoder_step, encoder_forward,
                                            init_kv_cache, reorder_kv_cache)
from godot_whisper_tpu.models.params import init_params


@pytest.fixture(scope="module")
def tiny_cfg():
    # a scaled-down config for fast CPU tests
    return get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_ctx=64, n_text_ctx=32,
        n_vocab=1024, name="nano")


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return init_params(tiny_cfg, seed=0, compute_dtype=jnp.float32)


def test_encoder_shapes(tiny_cfg, tiny_params):
    mel = jnp.zeros((1, 2 * tiny_cfg.n_audio_ctx, tiny_cfg.n_mels))
    out = encoder_forward(tiny_params, tiny_cfg, mel)
    assert out.shape == (1, tiny_cfg.n_audio_ctx, tiny_cfg.n_audio_state)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_encoder_reduced_audio_ctx(tiny_cfg, tiny_params):
    """audio_ctx override shrinks the encoder sequence
    (whisper.cpp:1668,1762 exp_n_audio_ctx)."""
    ac = 16
    mel = jnp.zeros((1, 2 * ac, tiny_cfg.n_mels))
    out = encoder_forward(tiny_params, tiny_cfg, mel, audio_ctx=ac)
    assert out.shape == (1, ac, tiny_cfg.n_audio_state)


def test_decoder_prompt_then_step(tiny_cfg, tiny_params):
    B = 2
    mel = jnp.zeros((1, 2 * tiny_cfg.n_audio_ctx, tiny_cfg.n_mels))
    enc = encoder_forward(tiny_params, tiny_cfg, mel)
    xkv = cross_kv(tiny_params, tiny_cfg, enc)
    # broadcast cross KV to the beam batch
    xkv = type(xkv)(k=jnp.repeat(xkv.k, B, axis=1),
                    v=jnp.repeat(xkv.v, B, axis=1), t_valid=xkv.t_valid)

    kv = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    T = 4
    tokens = jnp.array([[5, 6, 7, 8]] * B, dtype=jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, kv = decoder_dense(tiny_params, tiny_cfg, tokens, positions,
                               kv, xkv, n_valid=T)
    assert logits.shape == (B, T, tiny_cfg.n_vocab)

    # single step at slot/position T (contiguous cache: split=0)
    tok = jnp.array([9, 10], dtype=jnp.int32)
    pos = jnp.full((B,), T, dtype=jnp.int32)
    logits2, kv = decoder_step(tiny_params, tiny_cfg, tok, pos, kv, xkv,
                               lo=jnp.zeros(B, jnp.int32),
                               slot=jnp.int32(T), split=0)
    assert logits2.shape == (B, tiny_cfg.n_vocab)
    assert np.isfinite(np.asarray(logits2)).all()


def test_step_equals_prompt_incremental(tiny_cfg, tiny_params):
    """Decoding token-by-token through the cache must equal one batched
    prompt pass (KV-cache correctness)."""
    B = 1
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (1, 2 * tiny_cfg.n_audio_ctx, tiny_cfg.n_mels)).astype(np.float32))
    enc = encoder_forward(tiny_params, tiny_cfg, mel)
    xkv = cross_kv(tiny_params, tiny_cfg, enc)

    toks = [3, 14, 15, 9, 26]
    T = len(toks)
    tokens = jnp.asarray([toks], dtype=jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    kv0 = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    full_logits, _ = decoder_dense(tiny_params, tiny_cfg, tokens, positions,
                                   kv0, xkv, n_valid=T)

    kv = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    step_logits = []
    for t, tok in enumerate(toks):
        lg, kv = decoder_step(
            tiny_params, tiny_cfg,
            jnp.asarray([tok], dtype=jnp.int32),
            jnp.full((B,), t, dtype=jnp.int32), kv, xkv,
            lo=jnp.zeros(B, jnp.int32), slot=jnp.int32(t), split=0)
        step_logits.append(np.asarray(lg[0]))

    np.testing.assert_allclose(
        np.stack(step_logits), np.asarray(full_logits[0]), atol=2e-4)


def test_kv_reorder_gather(tiny_cfg):
    kv = init_kv_cache(tiny_cfg, 4, dtype=jnp.float32)
    kv = type(kv)(
        k=kv.k.at[:, 2].set(7.0),
        v=kv.v.at[:, 2].set(9.0))
    out = reorder_kv_cache(kv, jnp.array([2, 2, 0, 1]))
    assert float(out.k[0, 0, 0, 0]) == 7.0
    assert float(out.k[0, 1, 0, 0]) == 7.0
    assert float(out.k[0, 2, 0, 0]) == 0.0
    assert float(out.v[0, 0, 0, 0]) == 9.0


# --------------------------------------------------------------- HF parity --
@pytest.mark.parametrize("d_model,heads,layers", [(64, 4, 2)])
def test_parity_vs_transformers(d_model, heads, layers):
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel

    from godot_whisper_tpu.models.loader_hf import (config_from_hf,
                                                    params_from_hf_state_dict)

    hf_cfg = HFConfig(
        vocab_size=500, num_mel_bins=80, d_model=d_model,
        encoder_layers=layers, encoder_attention_heads=heads,
        decoder_layers=layers, decoder_attention_heads=heads,
        encoder_ffn_dim=4 * d_model, decoder_ffn_dim=4 * d_model,
        max_source_positions=64, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    hf_model = WhisperModel(hf_cfg).eval()

    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       compute_dtype=jnp.float32)

    rng = np.random.default_rng(42)
    mel = rng.standard_normal((1, 80, 128)).astype(np.float32)  # (B, M, 2*ctx)
    dec_ids = np.array([[3, 7, 11, 2]], dtype=np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(dec_ids),
            output_hidden_states=False)
    hf_enc = hf_out.encoder_last_hidden_state.numpy()
    hf_dec = hf_out.last_hidden_state.numpy()

    enc = encoder_forward(params, cfg, jnp.asarray(mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(enc), hf_enc, atol=2e-4)

    xkv = cross_kv(params, cfg, enc)
    kv = init_kv_cache(cfg, 1, dtype=jnp.float32)
    T = dec_ids.shape[1]
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (1, T))

    logits, _ = decoder_dense(params, cfg,
                              jnp.asarray(dec_ids, dtype=jnp.int32),
                              positions, kv, xkv, n_valid=T)
    # HF returns decoder hidden state; project ours back via embedding
    # is lossy, so compare logits computed from HF hidden state instead.
    hf_logits = hf_dec @ np.asarray(params["decoder"]["token_embed"]).T
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3)


def test_quantized_cross_kv_close(tiny_cfg, tiny_params):
    """int8 cross-KV attention approximates the bf16 path."""
    import numpy as np
    from godot_whisper_tpu.models.model import quantize_cross_kv

    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal(
        (1, 2 * tiny_cfg.n_audio_ctx, tiny_cfg.n_mels)).astype(np.float32))
    enc = encoder_forward(tiny_params, tiny_cfg, mel)
    xkv = cross_kv(tiny_params, tiny_cfg, enc)
    qkv = quantize_cross_kv(xkv, tiny_cfg.n_text_head)

    B, T = 1, 4
    tokens = jnp.asarray([[5, 6, 7, 8]], dtype=jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    kv0 = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    ref_logits, _ = decoder_dense(tiny_params, tiny_cfg, tokens,
                                  positions, kv0, xkv, n_valid=T)
    kv0 = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    q_logits, _ = decoder_dense(tiny_params, tiny_cfg, tokens,
                                positions, kv0, qkv, n_valid=T)
    a = np.asarray(ref_logits)
    b = np.asarray(q_logits)
    # int8 quantization noise: numeric closeness (random weights give
    # near-flat logits, so exact argmax is not a meaningful check here)
    assert np.abs(a - b).mean() < 0.02
    assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.999
