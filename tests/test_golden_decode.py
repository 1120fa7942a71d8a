"""Golden decode-semantics lock (VERDICT r3 ask #7).

The device/host parity suites compare the two decode paths to each other
and to HF processors — nothing pins ABSOLUTE outputs, so a refactor that
shifts both paths identically would pass silently.  This test freezes:

- the weights: ``init_params(nano, seed=3)`` (a change to the init
  recipe fails this loudly — regenerate deliberately);
- the audio: a fixed 5 s synthetic utterance;
- the outputs: the RAW first-window decode state — token matrix,
  timestamp ids, result lengths, seek deltas, step counts, ladder
  temperature, emission flags — for greedy and beam-5, checked into
  tests/golden/nano_decode.json.  Raw window state rather than emitted
  segments because a random nano model legitimately fails whisper's
  emission gates (as the reference's decoders do on noise); the filter
  stack, sampling, beam merge and per-decoder state machine all still
  execute, and any change to their semantics shifts these values.

This is the role of the reference's checked-in transcripts
(/root/reference/thirdparty/whisper.cpp/tests/run-tests.sh +
tests/en-*-ref.txt) for a world without network access: any change to
mel normalization, the logit-filter stack, timestamp rules, sampling,
the beam merge, or the fallback ladder shifts these discrete values.

Regenerate (after an INTENTIONAL semantics change, with justification in
the commit message):
    python -m pytest tests/test_golden_decode.py --golden-regen
"""

import json
import os

import numpy as np
import pytest

import godot_whisper_tpu as gwt

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "nano_decode.json")


def _frozen_audio():
    t = np.arange(5 * 16000) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 220.0 * t)
         + 0.2 * np.sin(2 * np.pi * 447.0 * t)
         * (0.5 + 0.5 * np.sin(2 * np.pi * 1.7 * t)))
    return x.astype(np.float32)


@pytest.fixture()
def golden_ctx():
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=128,
        n_audio_head=4, n_text_state=128, n_text_head=4, name="nano")
    params = init_params(cfg, seed=3, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    return gwt.WhisperContext(pipe)


def _decode_raw(ctx, beam: bool):
    """Decode the first 30 s window through WindowDecoder (the full
    in-jit loop: prompt pass, logit-filter stack, sampling / beam merge,
    per-decoder state machine) and return its RAW LoopState token
    matrix — defined whether or not whisper's quality gates would emit."""
    from godot_whisper_tpu.decode.filters import build_filter_context
    from godot_whisper_tpu.decode.window import WindowDecoder
    from godot_whisper_tpu.models.model import (cross_kv,
                                                encoder_forward)

    pipe = ctx.pipeline
    cfg = ctx.config
    mel = pipe.mel.device(_frozen_audio())[0]
    n_ctx = cfg.n_audio_ctx
    import jax.numpy as jnp
    window = jnp.transpose(mel[:, :2 * n_ctx])[None]
    enc = encoder_forward(pipe.params, cfg, window)
    xkv = cross_kv(pipe.params, cfg, enc)
    fctx = build_filter_context(cfg, pipe.tokenizer)
    wd = WindowDecoder(cfg, fctx)
    prompt = np.asarray([cfg.token_sot], np.int32)
    res = wd.decode(
        pipe.params, xkv, prompt,
        n_decoders=5 if beam else 1,
        temperature=0.0,
        strategy="beam" if beam else "greedy",
        beam_size=5 if beam else 1,
        seek=0, seek_end=500,
        suppress_blank=True, no_timestamps=False, single_segment=False,
        max_tokens=0, test_mode=False)
    n = min(res.n_steps, 48)
    return {
        "n_steps": res.n_steps,
        "tokens": [[int(x) for x in row[:n]] for row in res.tokens],
        "tid": [[int(x) for x in row[:n]] for row in res.tok_tid],
        "result_len": [int(x) for x in res.result_len],
        "seek_delta": [int(x) for x in res.seek_delta],
        "completed": [bool(x) for x in res.completed],
        "failed": [bool(x) for x in res.failed],
        "sum_logprobs": [round(float(x), 3)
                         for x in res.sum_logprobs_all],
    }


def test_golden_greedy_and_beam(golden_ctx, request):
    got = {"greedy": _decode_raw(golden_ctx, beam=False),
           "beam5": _decode_raw(golden_ctx, beam=True)}
    if request.config.getoption("--golden-regen", default=False):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
        pytest.skip(f"golden regenerated at {GOLDEN}")
    assert os.path.exists(GOLDEN), (
        "golden file missing — run with --golden-regen once")
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want, (
        "decode semantics shifted vs the checked-in golden transcript; "
        "if intentional, regenerate with --golden-regen and justify in "
        "the commit message")


# ---------------------------------------------------------------------------
# Clip-loop scenario goldens (VERDICT r4 weak #5: ladder-fallback,
# multi-window, translate paths frozen — not just the first window)
GOLDEN_CLIP = os.path.join(os.path.dirname(__file__), "golden",
                           "nano_clip_scenarios.json")


def _clip_scenario(ctx, audio, tparams, prompt_init, temps):
    """Run the device clip loop and snapshot its window-level state."""
    pipe = ctx.pipeline
    pipe.set_audio(audio)
    cd = pipe._clip_decoder(tparams, temps, prompt_init, False,
                            pipe._mel_device.shape[1])
    state = cd.init_state(pipe._mel_device[None], [pipe._mel_n_len],
                          [0], [pipe._n_len_org], past_init=[[]])
    state = cd.run(pipe.params, state)
    outs = cd.drain(state)
    W = int(outs.w[0])
    return {
        "w": W,
        "done": bool(outs.done[0]),
        "past_cnt": int(outs.past_cnt[0]),
        "windows": [{
            "seek": int(outs.seek[0, k]),
            "delta": int(outs.delta[0, k]),
            "rl": int(outs.rl[0, k]),
            "emitted": bool(outs.emitted[0, k]),
            "temp": round(float(outs.temp[0, k]), 3),
            "tokens": [int(x) for x in
                       outs.tokens[0, k, :min(int(outs.rl[0, k]), 24)]],
        } for k in range(W)],
    }


def _multi_audio(seconds: float):
    t = np.arange(int(seconds * 16000)) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * (220.0 + 60 * np.sin(
        2 * np.pi * 0.07 * t)) * t)
        + 0.2 * np.sin(2 * np.pi * 447.0 * t)
        * (0.5 + 0.5 * np.sin(2 * np.pi * 1.7 * t)))
    return x.astype(np.float32)


@pytest.fixture()
def golden_ctx_multi():
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=128,
        n_audio_head=4, n_text_state=128, n_text_head=4,
        name="nano-multi")
    params = init_params(cfg, seed=3, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    return gwt.WhisperContext(pipe)


def test_golden_clip_scenarios(golden_ctx, golden_ctx_multi, request):
    """Freezes the DEVICE clip loop across three scenario axes:

    - ``multiwindow``: 34 s clip, two windows, prompt_past conditioning
      between them (whisper.cpp:5237-5260) — gates disabled so windows
      emit on a random nano model;
    - ``ladder``: default gates + temps (0.0, 0.2, 0.4) — the entropy
      gate legitimately rejects rung 0 on noise and the settled
      temperature/step counts pin the fallback machinery
      (whisper.cpp:5611-5671);
    - ``translate``: multilingual nano, [sot, lang(de), translate]
      prefix (whisper.cpp:5104-5116).
    """
    cfg = golden_ctx.config
    mcfg = golden_ctx_multi.config
    base = dict(best_of=1, temperature_inc=0.0, print_progress=False)
    p_open = gwt.TranscribeParams(entropy_thold=-1e9, logprob_thold=-1e9,
                                  **base)
    p_ladder = gwt.TranscribeParams(temperature=0.0, **{
        **base, "temperature_inc": 0.2})
    from godot_whisper_tpu.decode.language import lang_id
    got = {
        "multiwindow": _clip_scenario(
            golden_ctx, _multi_audio(34.0), p_open,
            [cfg.token_sot], [0.0]),
        "ladder": _clip_scenario(
            golden_ctx, _multi_audio(5.0), p_ladder,
            [cfg.token_sot], [0.0, 0.2, 0.4]),
        "translate": _clip_scenario(
            golden_ctx_multi, _multi_audio(5.0), p_open,
            [mcfg.token_sot, mcfg.token_lang(lang_id("de")),
             mcfg.token_translate], [0.0]),
    }
    if request.config.getoption("--golden-regen", default=False):
        with open(GOLDEN_CLIP, "w") as f:
            json.dump(got, f, indent=1)
        pytest.skip(f"golden regenerated at {GOLDEN_CLIP}")
    assert os.path.exists(GOLDEN_CLIP), (
        "golden file missing — run with --golden-regen once")
    with open(GOLDEN_CLIP) as f:
        want = json.load(f)
    assert got == want, (
        "clip-loop semantics shifted vs the checked-in golden; if "
        "intentional, regenerate with --golden-regen and justify in the "
        "commit message")
