"""Decode-semantics parity vs transformers' Whisper generation.

transformers implements the same OpenAI decode rules (begin-suppress,
timestamp pairing, timestamp-sum-vs-text, initial-timestamp cap) in its
WhisperTimeStampLogitsProcessor — running both stacks over the SAME random
weights and the SAME mel must produce the same greedy token stream.  This
is the strongest offline proxy for WER parity available without real
checkpoints (the reference verifies quality the same way: transcript diffs,
tests/run-tests.sh).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def paired_models():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.loader_hf import (config_from_hf,
                                                    params_from_hf_state_dict)
    import godot_whisper_tpu as gwt

    # small model but with the REAL tiny.en token space so special-token
    # semantics line up
    hf_cfg = HFConfig(
        vocab_size=51864, num_mel_bins=80, d_model=128,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=512, decoder_ffn_dim=512,
        max_source_positions=1500, max_target_positions=448,
        decoder_start_token_id=50257, eos_token_id=50256,
        pad_token_id=50256, bos_token_id=50256,
    )
    torch.manual_seed(7)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()
    gc = hf_model.generation_config
    gc.no_timestamps_token_id = 50362
    gc.max_initial_timestamp_index = 50
    gc.decoder_start_token_id = 50257
    gc.eos_token_id = 50256
    gc.pad_token_id = 50256
    gc.is_multilingual = False

    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(hf_model.model.state_dict(), cfg,
                                       compute_dtype=jnp.float32,
                                       prefix="")
    tok = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tok, mel_filterbank(80), n_loaded=1)
    return gwt.WhisperContext(pipe), hf_model, cfg


def _mel_window(pipe, audio):
    pipe.set_audio(audio)
    mel = pipe.mel_host()
    win = np.zeros((80, 3000), dtype=np.float32)
    n = min(3000, mel.shape[1])
    win[:, :n] = mel[:, :n]
    return win


@pytest.mark.parametrize("seed", [0, 1])
def test_greedy_token_parity(paired_models, seed):
    import godot_whisper_tpu as gwt

    ctx, hf_model, cfg = paired_models

    rng = np.random.default_rng(seed)
    t = np.arange(6 * 16000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * (300 + 50 * seed) * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    # ---- ours: one window decode, greedy, no ladder — compared at the
    # raw-token level (segment emission drops trailing window-edge tokens)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)
    pipe = ctx.pipeline
    pipe.set_audio(audio)
    _, xkv = pipe.encode_window(0, 0)
    wd = pipe._window_decoder(p)
    res = wd.decode(
        pipe.params, xkv,
        np.asarray([cfg.token_sot], dtype=np.int32),
        n_decoders=1, temperature=0.0, strategy="greedy", beam_size=1,
        seek=0, seek_end=pipe._n_len_org, suppress_blank=True,
        no_timestamps=False, single_segment=False, max_tokens=0,
        test_mode=False, seed=0)
    n_raw = int(res.n_steps)
    ours = res.tokens[0, :n_raw].tolist()
    while ours and ours[-1] == cfg.token_eot:
        ours = ours[:-1]

    # ---- transformers: same mel, greedy, same suppression set
    win = _mel_window(ctx.pipeline, audio)
    static_suppress = [cfg.token_not, cfg.token_sot, cfg.token_nosp,
                       cfg.token_solm, cfg.token_translate,
                       cfg.token_transcribe, cfg.token_prev]
    space_id = ctx.tokenizer.space_token_id
    with torch.no_grad():
        out = hf_model.generate(
            input_features=torch.from_numpy(win[None]),
            do_sample=False, num_beams=1, max_new_tokens=220,
            return_timestamps=True,
            suppress_tokens=static_suppress,
            begin_suppress_tokens=[space_id, cfg.token_eot],
        )
    hf_tokens = out[0].tolist()
    # strip the leading sot and trailing eot
    if hf_tokens and hf_tokens[0] == cfg.token_sot:
        hf_tokens = hf_tokens[1:]
    while hf_tokens and hf_tokens[-1] == cfg.token_eot:
        hf_tokens = hf_tokens[:-1]

    # our segments drop trailing timestamp tokens at the window edge;
    # compare the common prefix, requiring most of the stream to agree
    n = min(len(ours), len(hf_tokens))
    assert n > 0, (ours, hf_tokens)
    agree = 0
    for a, b in zip(ours[:n], hf_tokens[:n]):
        if a != b:
            break
        agree += 1
    assert agree >= max(1, int(0.9 * n)), (
        f"diverged at {agree}/{n}: ours={ours[:agree+3]} "
        f"hf={hf_tokens[:agree+3]}")
