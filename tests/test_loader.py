"""Checkpoint loader tests against the reference's shipped stub models and
our own writer (round-trip)."""

import numpy as np
import pytest

from godot_whisper_tpu.models import loader_ggml
from godot_whisper_tpu.models.config import get_config
from godot_whisper_tpu.models.params import (init_params, param_count,
                                             params_from_raw)


def test_read_reference_stub_tiny_en(stub_tiny_en):
    c = stub_tiny_en.config
    assert c.name == "tiny.en"
    assert c.n_vocab == 51864
    assert c.n_audio_state == 384
    assert c.n_audio_layer == 4
    assert c.n_mels == 80
    assert stub_tiny_en.mel_filters.shape == (80, 201)
    assert stub_tiny_en.n_loaded == 0  # weightless stub
    assert len(stub_tiny_en.vocab_tokens) > 50000


def test_read_reference_stub_multilingual(stub_tiny_multi):
    c = stub_tiny_multi.config
    assert c.name == "tiny"
    assert c.n_vocab == 51865
    assert c.is_multilingual
    # multilingual token layout (whisper.cpp:1242-1256 with 99 languages)
    assert c.token_eot == 50257
    assert c.token_sot == 50258
    assert c.token_translate == 50358
    assert c.token_transcribe == 50359
    assert c.token_beg == 50364
    assert c.num_languages == 99


def test_special_tokens_english_only():
    c = get_config("tiny.en")
    assert c.token_eot == 50256
    assert c.token_sot == 50257
    assert c.token_beg == 50363
    assert not c.is_multilingual


def test_special_tokens_large_v3():
    c = get_config("large-v3")
    assert c.n_vocab == 51866
    assert c.num_languages == 100
    assert c.token_eot == 50257
    assert c.token_beg == 50365


def test_roundtrip_write_read(tmp_path):
    cfg = get_config("tiny.en")
    filters = np.random.default_rng(0).standard_normal(
        (80, 201)).astype(np.float32)
    vocab = [b"a", b"b", b" the", b""]
    tensors = {
        "decoder.ln.weight": (
            np.arange(384, dtype=np.float32), loader_ggml.GGML_TYPE_F32),
        "encoder.conv1.bias": (
            np.ones((384, 1), dtype=np.float32), loader_ggml.GGML_TYPE_F16),
    }
    p = str(tmp_path / "rt.bin")
    loader_ggml.write_checkpoint(p, cfg, filters, vocab, tensors)
    raw = loader_ggml.read_checkpoint(p)
    assert raw.config.n_vocab == cfg.n_vocab
    np.testing.assert_allclose(raw.mel_filters, filters)
    assert raw.vocab_tokens == vocab
    np.testing.assert_allclose(
        raw.tensors["decoder.ln.weight"], np.arange(384), rtol=1e-6)
    assert raw.tensors["encoder.conv1.bias"].shape == (384, 1)


def test_params_from_stub_zero_filled(stub_tiny_en):
    params = params_from_raw(stub_tiny_en, to_device=False)
    assert params["encoder"]["conv1"]["w"].shape == (3, 80, 384)
    assert params["encoder"]["blocks"]["attn"]["wq"].shape == (4, 384, 384)
    assert params["decoder"]["token_embed"].shape == (51864, 384)
    assert params["decoder"]["blocks"]["cross_attn"]["wk"].shape == (4, 384, 384)


def test_init_params_count():
    # tiny has ~39M params (whisper.cpp README "tiny 39M")
    params = init_params(get_config("tiny.en"), seed=0)
    n = param_count(params)
    assert 35e6 < n < 42e6


def test_dequant_q8_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(64).astype(np.float32)
    # quantize to q8_0 manually: blocks of 32, d = absmax/127
    blocks = x.reshape(2, 32)
    d = np.abs(blocks).max(axis=1, keepdims=True) / 127.0
    q = np.round(blocks / d).astype(np.int8)
    raw = b""
    for bi in range(2):
        raw += d[bi].astype("<f2").tobytes() + q[bi].tobytes()
    out = loader_ggml._dequant(loader_ggml.GGML_TYPE_Q8_0, raw, 64)
    np.testing.assert_allclose(out, x, atol=2e-2)
