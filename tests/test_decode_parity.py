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

    # lengths may differ (our end-of-audio completion rules stop at the
    # window edge where HF keeps generating); every shared position must
    # match EXACTLY
    n = min(len(ours), len(hf_tokens))
    assert n > 0, (ours, hf_tokens)
    assert ours[:n] == hf_tokens[:n], (
        f"diverged within the first {n} tokens:\n"
        f"ours={ours[:n]}\nhf  ={hf_tokens[:n]}")


def _our_beam_pool(ctx, cfg, audio, beam_size, seed=0):
    import godot_whisper_tpu as gwt
    p = gwt.TranscribeParams(strategy=gwt.SamplingStrategy.BEAM_SEARCH,
                             beam_size=beam_size, temperature_inc=0.0)
    pipe = ctx.pipeline
    pipe.set_audio(audio)
    _, xkv = pipe.encode_window(0, 0)
    wd = pipe._window_decoder(p)
    res = wd.decode(
        pipe.params, xkv,
        np.asarray([cfg.token_sot], dtype=np.int32),
        n_decoders=beam_size, temperature=0.0, strategy="beam",
        beam_size=beam_size, seek=0, seek_end=pipe._n_len_org,
        suppress_blank=True, no_timestamps=False, single_segment=False,
        max_tokens=0, test_mode=False, seed=seed)
    pool = []
    for b in range(beam_size):
        rl = int(res.result_len[b]) or int(res.n_steps)
        pool.append(res.tokens[b, :rl].tolist())
    return pool, res


def test_beam1_equals_greedy(paired_models):
    """The beam machinery (candidate expansion + global merge + KV
    reorder, whisper.cpp:5360-5419) must reduce EXACTLY to greedy at
    beam_size=1 — same weights, same mel, token-for-token."""
    import godot_whisper_tpu as gwt
    ctx, _, cfg = paired_models

    rng = np.random.default_rng(5)
    t = np.arange(5 * 16000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 260 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    (beam_toks,), _ = _our_beam_pool(ctx, cfg, audio, beam_size=1)

    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)
    pipe = ctx.pipeline
    pipe.set_audio(audio)
    _, xkv = pipe.encode_window(0, 0)
    wd = pipe._window_decoder(p)
    res = wd.decode(
        pipe.params, xkv, np.asarray([cfg.token_sot], dtype=np.int32),
        n_decoders=1, temperature=0.0, strategy="greedy", beam_size=1,
        seek=0, seek_end=pipe._n_len_org, suppress_blank=True,
        no_timestamps=False, single_segment=False, max_tokens=0,
        test_mode=False, seed=0)
    rl = int(res.result_len[0]) or int(res.n_steps)
    greedy_toks = res.tokens[0, :rl].tolist()
    assert beam_toks == greedy_toks


def test_beam5_expansion_parity_vs_hf(paired_models):
    """Beam-5 cross-validation vs transformers over the same weights.

    Full winner parity with HF is IMPOSSIBLE by design: this framework
    keeps whisper.cpp's semantics, where a completed decoder retires in
    its slot and the live width shrinks (whisper.cpp:5327-5419, :5467-90),
    while HF banks finished hypotheses and replenishes live beams.  What
    must agree — and is asserted here — is the search along HF's winning
    path: HF's best sequence must appear in OUR final pool as a beam
    (prefix-equal up to our earlier whisper-rules completion point), i.e.
    the logit filters, top-k expansion, and merge kept that path alive and
    token-identical."""
    import godot_whisper_tpu as gwt  # noqa: F401
    ctx, hf_model, cfg = paired_models

    rng = np.random.default_rng(3)
    t = np.arange(6 * 16000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 350 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    pool, _ = _our_beam_pool(ctx, cfg, audio, beam_size=5)

    win = _mel_window(ctx.pipeline, audio)
    static_suppress = [cfg.token_not, cfg.token_sot, cfg.token_nosp,
                       cfg.token_solm, cfg.token_translate,
                       cfg.token_transcribe, cfg.token_prev]
    space_id = ctx.tokenizer.space_token_id
    with torch.no_grad():
        out = hf_model.generate(
            input_features=torch.from_numpy(win[None]),
            do_sample=False, num_beams=5, max_new_tokens=220,
            return_timestamps=True, length_penalty=1.0,
            suppress_tokens=static_suppress,
            begin_suppress_tokens=[space_id, cfg.token_eot],
        )
    hf_best = out[0].tolist()
    if hf_best and hf_best[0] == cfg.token_sot:
        hf_best = hf_best[1:]
    while hf_best and hf_best[-1] == cfg.token_eot:
        hf_best = hf_best[:-1]

    matches = [b for b in pool
               if len(b) >= 3 and b == hf_best[:len(b)]]
    assert matches, (
        f"no beam in our pool is a prefix of HF's winner:\n"
        f"pool={pool}\nhf_best={hf_best}")


def test_temperature_ladder_sampling(paired_models):
    """t>0 rung of the ladder (whisper.cpp:5187-5206 sampled decoding):
    seeded sampling is deterministic per seed, differs across seeds, and
    still respects the filter stack (tokens in-vocab, timestamps paired
    monotonic)."""
    import godot_whisper_tpu as gwt
    ctx, _, cfg = paired_models

    rng = np.random.default_rng(9)
    t = np.arange(4 * 16000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 300 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)
    pipe = ctx.pipeline
    pipe.set_audio(audio)
    _, xkv = pipe.encode_window(0, 0)
    wd = pipe._window_decoder(p)

    def run(seed):
        res = wd.decode(
            pipe.params, xkv, np.asarray([cfg.token_sot], dtype=np.int32),
            n_decoders=1, temperature=0.7, strategy="greedy", beam_size=1,
            seek=0, seek_end=pipe._n_len_org, suppress_blank=True,
            no_timestamps=False, single_segment=False, max_tokens=0,
            test_mode=False, seed=seed)
        n = int(res.result_len[0]) or int(res.n_steps)
        return res.tokens[0, :n].tolist()

    a1, a2, b = run(11), run(11), run(12)
    assert a1 == a2, "same seed must reproduce the same sampled stream"
    assert a1 != b, "different seeds should explore different streams"
    for toks in (a1, b):
        assert all(0 <= tk < cfg.n_vocab for tk in toks)
        ts = [tk for tk in toks if tk >= cfg.token_beg]
        assert ts == sorted(ts), f"timestamps regressed: {toks}"
