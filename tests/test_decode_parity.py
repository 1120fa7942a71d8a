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


def _make_paired(vocab_size: int, dec_layers: int, seed: int = 7):
    """Build a (WhisperContext, hf_model, cfg) pair sharing weights: a
    small random model in a REAL Whisper token space (English 51864 or
    multilingual 51865 — special-token semantics line up)."""
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.loader_hf import (config_from_hf,
                                                    params_from_hf_state_dict)
    import godot_whisper_tpu as gwt

    dt = vocab_size - 51864   # multilingual token-id shift
    hf_cfg = HFConfig(
        vocab_size=vocab_size, num_mel_bins=80, d_model=128,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=dec_layers, decoder_attention_heads=4,
        encoder_ffn_dim=512, decoder_ffn_dim=512,
        max_source_positions=1500, max_target_positions=448,
        decoder_start_token_id=50257 + dt, eos_token_id=50256 + dt,
        pad_token_id=50256 + dt, bos_token_id=50256 + dt,
    )
    torch.manual_seed(seed)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()
    gc = hf_model.generation_config
    gc.no_timestamps_token_id = 50362 + dt
    gc.max_initial_timestamp_index = 50
    gc.decoder_start_token_id = 50257 + dt
    gc.eos_token_id = 50256 + dt
    gc.pad_token_id = 50256 + dt
    gc.is_multilingual = dt > 0

    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(hf_model.model.state_dict(), cfg,
                                       compute_dtype=jnp.float32,
                                       prefix="")
    tok = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tok, mel_filterbank(80), n_loaded=1)
    return gwt.WhisperContext(pipe), hf_model, cfg


@pytest.fixture(scope="module")
def paired_models():
    # 2 decoder layers: ALSO regression-covers the reference's distil
    # heuristic (n_text_layer == 2 forces no_timestamps in full(),
    # whisper.cpp:5119-5125) staying out of these direct-decode tests
    return _make_paired(51864, dec_layers=2)


@pytest.fixture(scope="module")
def paired_models_mw():
    # 3 decoder layers so ctx-level decode keeps timestamps (the
    # reference forces no_timestamps when n_text_layer == 2)
    return _make_paired(51864, dec_layers=3)


@pytest.fixture(scope="module")
def paired_models_multilingual():
    return _make_paired(51865, dec_layers=3)


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


class _V151TimeStampProcessor:
    """transformers' WhisperTimeStampLogitsProcessor with ONE rule
    reverted: timestamps must be >= the last taken timestamp (equality
    ALLOWED — whisper.cpp v1.5.1:4627-4635 masks ts < seek_delta/2),
    where current HF ships the later OpenAI PR-914 strictly-increasing
    variant.  Everything else (pair rule, initial-ts force and cap,
    log-softmax, ts-sum-vs-max-text) is HF's own independent code path,
    so the differential keeps its value."""

    def __init__(self, generation_config, begin_index: int):
        self.no_timestamps_token_id = generation_config.no_timestamps_token_id
        self.timestamp_begin = generation_config.no_timestamps_token_id + 1
        self.eos_token_id = generation_config.eos_token_id
        self.begin_index = begin_index
        self.max_initial_timestamp_index = \
            generation_config.max_initial_timestamp_index

    def __call__(self, input_ids, scores):
        scores = scores.clone()
        scores[:, self.no_timestamps_token_id] = -float("inf")
        for k in range(input_ids.shape[0]):
            sampled = input_ids[k, self.begin_index:]
            seq = list(sampled.tolist())
            last_ts = len(seq) >= 1 and seq[-1] >= self.timestamp_begin
            pen_ts = len(seq) < 2 or seq[-2] >= self.timestamp_begin
            if last_ts:
                if pen_ts:
                    scores[k, self.timestamp_begin:] = -float("inf")
                else:
                    scores[k, : self.eos_token_id] = -float("inf")
            ts = sampled[sampled.ge(self.timestamp_begin)]
            if ts.numel() > 0:
                scores[k, self.timestamp_begin: ts[-1]] = -float("inf")
        if input_ids.shape[1] == self.begin_index:
            scores[:, : self.timestamp_begin] = -float("inf")
            if self.max_initial_timestamp_index is not None:
                last_allowed = (self.timestamp_begin
                                + self.max_initial_timestamp_index)
                scores[:, last_allowed + 1:] = -float("inf")
        logprobs = torch.nn.functional.log_softmax(scores.float(), dim=-1)
        for k in range(input_ids.shape[0]):
            ts_lp = logprobs[k, self.timestamp_begin:].logsumexp(dim=-1)
            max_text = logprobs[k, : self.timestamp_begin].max()
            if ts_lp > max_text:
                scores[k, : self.timestamp_begin] = -float("inf")
        return scores


def _hf_window(hf_model, cfg, fctx, win, prompt, max_new: int = 220):
    """One HF greedy window decode with OUR prompt as decoder_input_ids
    and the filter set aligned to fctx (returns generated tokens, eot
    stripped)."""
    from transformers.generation.logits_process import (
        LogitsProcessorList, SuppressTokensAtBeginLogitsProcessor,
        SuppressTokensLogitsProcessor)
    sup_ids = np.where(np.asarray(fctx.static_suppress))[0].tolist()
    procs = LogitsProcessorList([
        SuppressTokensLogitsProcessor(sup_ids, device="cpu"),
        SuppressTokensAtBeginLogitsProcessor(
            [fctx.space_id, cfg.token_eot], begin_index=len(prompt),
            device="cpu"),
        _V151TimeStampProcessor(hf_model.generation_config,
                                begin_index=len(prompt)),
    ])
    with torch.no_grad():
        out = hf_model.generate(
            input_features=torch.from_numpy(win[None]),
            decoder_input_ids=torch.tensor([prompt]),
            do_sample=False, num_beams=1, max_new_tokens=max_new,
            logits_processor=procs, return_timestamps=False)
    hf_w = out[0].tolist()
    if hf_w[:len(prompt)] == prompt:  # HF strips decoder_input_ids on
        hf_w = hf_w[len(prompt):]     # some versions — handle both
    while hf_w and hf_w[-1] == cfg.token_eot:
        hf_w = hf_w[:-1]
    return hf_w


def _run_clip_windows(ctx, audio, prompt_init, tparams):
    """Drive the DEVICE clip loop (decode/clip.py — the production
    full() path) and return (raw windows, seeks, n_len, mel)."""
    pipe = ctx.pipeline
    pipe.set_audio(audio)
    cd = pipe._clip_decoder(tparams, [0.0], prompt_init, False,
                            pipe._mel_device.shape[1])
    state = cd.init_state(pipe._mel_device[None], [pipe._mel_n_len],
                          [0], [pipe._n_len_org], past_init=[[]])
    state = cd.run(pipe.params, state)
    outs = cd.drain(state)
    W = int(outs.w[0])
    windows = [(int(outs.seek[0, k]),
                outs.tokens[0, k, :int(outs.rl[0, k])].tolist())
               for k in range(W)]
    return windows, pipe._n_len_org, pipe.mel_host()


def test_multiwindow_clip_parity_vs_hf(paired_models_mw):
    """FULL-PIPELINE differential (VERDICT r4 ask #4): a >60 s clip
    through the device-resident clip loop — seek loop, device prompt
    build with prompt_past conditioning (whisper.cpp:5237-5260), and
    the stale-context drop near the end (whisper.cpp:5176-5180) — must
    be token-identical, window by window, to transformers decoding the
    same mel slices with the same host-reconstructed prompts."""
    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.decode.filters import build_filter_context

    ctx, hf_model, cfg = paired_models_mw
    rng = np.random.default_rng(0)
    # 64.5 s: 3 windows AND the last one starts within 5 s of the end,
    # exercising the stale-context drop (whisper.cpp:5176-5180)
    t = np.arange(int(64.5 * 16000)) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * (300 + 40 * np.sin(
        2 * np.pi * 0.05 * t)) * t)
        + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    # gates disabled: a random model legitimately trips the entropy
    # gate (whisper.cpp would ladder); the subject here is window
    # mechanics, not quality gating
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                             entropy_thold=-1e9, logprob_thold=-1e9,
                             print_progress=False)
    prompt_init = [cfg.token_sot]
    windows, n_len, mel = _run_clip_windows(ctx, audio, prompt_init, p)
    assert len(windows) >= 3, f"expected >=3 windows, got {windows}"

    fctx = build_filter_context(cfg, ctx.tokenizer)
    mel_full = np.zeros((80, mel.shape[1] + 3000), np.float32)
    mel_full[:, :mel.shape[1]] = mel

    past: list = []
    stale_seen = False
    total_compared = 0
    for k, (seek, ours_w) in enumerate(windows):
        pp = list(past)
        if seek > 0 and seek + 500 >= n_len:   # stale-context drop
            pp = []
            stale_seen = True
        n_take = min(16384, cfg.n_text_ctx // 2, len(pp))
        prompt = (([cfg.token_prev] + pp[-n_take:]) if pp else []) \
            + prompt_init
        win = mel_full[:, seek:seek + 3000].copy()
        win[:, max(0, n_len - seek):] = 0.0
        hf_w = _hf_window(hf_model, cfg, fctx, win, prompt)
        n = min(len(ours_w), len(hf_w))
        assert n >= 2, f"window {k} too short to compare: {ours_w}, {hf_w}"
        assert ours_w[:n] == hf_w[:n], (
            f"window {k} (seek={seek}, prompt_len={len(prompt)}) "
            f"diverged:\nours={ours_w[:n]}\nhf  ={hf_w[:n]}")
        total_compared += n
        if k > 0 and pp:
            assert len(prompt) > len(prompt_init), \
                "window 2+ should be past-conditioned"
        past = pp + ours_w
    assert total_compared >= 40, f"only {total_compared} tokens compared"
    assert stale_seen, (
        f"audio length should produce a stale-context-drop window; "
        f"seeks={[s for s, _ in windows]}, n_len={n_len}")


def test_translate_multilingual_parity_vs_hf(paired_models_multilingual):
    """Task-prefix differential (VERDICT r4 ask #4): multilingual model,
    [sot, lang, translate] and [sot, lang, transcribe] prefixes
    (whisper.cpp:5104-5129) must produce HF-identical token streams —
    including the shifted multilingual special-token ids and the
    language-token suppression in the filter set."""
    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.decode.filters import build_filter_context
    from godot_whisper_tpu.decode.language import lang_id

    ctx, hf_model, cfg = paired_models_multilingual
    assert cfg.is_multilingual
    rng = np.random.default_rng(4)
    t = np.arange(12 * 16000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 320 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                             entropy_thold=-1e9, logprob_thold=-1e9,
                             print_progress=False)
    fctx = build_filter_context(cfg, ctx.tokenizer)
    for task_tok in (cfg.token_translate, cfg.token_transcribe):
        prompt_init = [cfg.token_sot, cfg.token_lang(lang_id("de")),
                       task_tok]
        windows, n_len, mel = _run_clip_windows(ctx, audio, prompt_init,
                                                p)
        assert windows, "no window decoded"
        seek, ours_w = windows[0]
        win = np.zeros((80, 3000), np.float32)
        m = min(3000, mel.shape[1])
        win[:, :m] = mel[:, :m]
        win[:, max(0, n_len):] = 0.0
        hf_w = _hf_window(hf_model, cfg, fctx, win, prompt_init)
        n = min(len(ours_w), len(hf_w))
        assert n >= 5, (ours_w, hf_w)
        assert ours_w[:n] == hf_w[:n], (
            f"task={task_tok}:\nours={ours_w[:n]}\nhf  ={hf_w[:n]}")


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
