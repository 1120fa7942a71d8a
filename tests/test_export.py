"""ggml export round-trip: pytree -> .bin -> pytree preserves the forward
pass (the save-path for fine-tuned models)."""

import numpy as np
import pytest

import jax.numpy as jnp

import godot_whisper_tpu as gwt
from godot_whisper_tpu.audio.mel import mel_filterbank
from godot_whisper_tpu.audio.tokenizer import synthetic_vocab
from godot_whisper_tpu.models import loader_ggml
from godot_whisper_tpu.models.export_ggml import export_checkpoint
from godot_whisper_tpu.models.loader_ggml import read_checkpoint
from godot_whisper_tpu.models.model import encoder_forward
from godot_whisper_tpu.models.params import init_params, params_from_raw


@pytest.mark.parametrize("ttype", [loader_ggml.GGML_TYPE_F32,
                                   loader_ggml.GGML_TYPE_F16])
def test_export_roundtrip_forward(tmp_path, rng, ttype):
    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=64, n_audio_head=2,
        n_text_state=64, n_text_head=2, n_audio_ctx=64, n_text_ctx=32,
        n_vocab=1024, name="nano")
    params = init_params(cfg, seed=3, compute_dtype=jnp.float32)

    path = str(tmp_path / "nano.bin")
    export_checkpoint(path, params, cfg, mel_filterbank(80),
                      synthetic_vocab(cfg), ttype=ttype)

    raw = read_checkpoint(path)
    assert raw.n_loaded > 50  # all tensors present
    params2 = params_from_raw(raw, compute_dtype=jnp.float32)

    mel = jnp.asarray(rng.standard_normal(
        (1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
    a = np.asarray(encoder_forward(params, cfg, mel))
    b = np.asarray(encoder_forward(params2, cfg, mel))
    atol = 1e-5 if ttype == loader_ggml.GGML_TYPE_F32 else 5e-3
    np.testing.assert_allclose(a, b, atol=atol)
