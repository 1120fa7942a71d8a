"""Device-resident whole-clip loop (decode/clip.py) vs the host seek loop.

The clip loop moves the reference's host-side orchestration
(whisper.cpp:5150-5804 — seek loop, temperature ladder, entropy/logprob
gates, prompt_past) on-device; these tests pin it token-for-token against
the parity-tested host path in decode/loop.py.
"""

import numpy as np
import pytest

import godot_whisper_tpu as gwt
from godot_whisper_tpu.decode.loop import WhisperPipeline


@pytest.fixture(scope="module")
def nano_ctx():
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    return gwt.WhisperContext(pipe)


def _clip(rng, seconds, freq):
    t = np.arange(int(seconds * 16000)) / 16000.0
    return (0.3 * np.sin(2 * np.pi * freq * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


def _run_host(ctx, tparams, clip):
    """Force the host seek loop (the device path disabled)."""
    pipe = ctx.pipeline
    orig = pipe._device_loop_eligible
    pipe._device_loop_eligible = lambda *a, **k: False
    try:
        return [s for s in pipe_full_fresh(pipe, tparams, clip)]
    finally:
        pipe._device_loop_eligible = orig


def pipe_full_fresh(pipe, tparams, clip):
    pipe._prompt_past = []
    return list(pipe.full(tparams, clip))


def _segs_key(segs):
    return [(s.t0, s.t1, s.text, [t.id for t in s.tokens]) for s in segs]


def test_device_path_taken(nano_ctx, rng):
    """Greedy best_of=1 must route through the device clip loop."""
    pipe = nano_ctx.pipeline
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)
    assert pipe._device_loop_eligible(p, p.temperatures(), "greedy")
    # best_of=5 ladder now runs on device too
    p2 = gwt.TranscribeParams()
    assert pipe._device_loop_eligible(p2, p2.temperatures(), "greedy")
    # mixed beam_size != best_of across rungs keeps the host path
    p3 = gwt.TranscribeParams(strategy=gwt.SamplingStrategy.BEAM_SEARCH,
                              beam_size=5, best_of=3)
    assert not pipe._device_loop_eligible(p3, p3.temperatures(), "beam")
    # grammar always keeps the host path
    p4 = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                              grammar_rules="root ::= \"a\"")
    assert not pipe._device_loop_eligible(p4, p4.temperatures(), "greedy")


@pytest.mark.parametrize("audio_ctx", [0, 256])
def test_device_matches_host_greedy(nano_ctx, rng, audio_ctx):
    clip = _clip(rng, 2.0, 220)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                             audio_ctx=audio_ctx)
    device = pipe_full_fresh(nano_ctx.pipeline, p, clip)
    host = _run_host(nano_ctx, p, clip)
    assert _segs_key(device) == _segs_key(host)


def test_device_matches_host_ladder(nano_ctx, rng):
    """In-jit temperature ladder (entropy/logprob gates + retry at higher
    t) against the host ladder with best_of=1."""
    clip = _clip(rng, 3.0, 330)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.4, seed=3)
    device = pipe_full_fresh(nano_ctx.pipeline, p, clip)
    host = _run_host(nano_ctx, p, clip)
    assert _segs_key(device) == _segs_key(host)


def test_device_matches_host_long_multiwindow(nano_ctx, rng):
    """> 30 s clip: multiple windows with prompt_past conditioning crossing
    window boundaries."""
    clip = _clip(rng, 35.0, 220)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)
    device = pipe_full_fresh(nano_ctx.pipeline, p, clip)
    host = _run_host(nano_ctx, p, clip)
    assert _segs_key(device) == _segs_key(host)


def test_device_prompt_past_persists(nano_ctx, rng):
    """no_context=False carries prompt_past across full() calls on the
    device path exactly as on the host path."""
    clip = _clip(rng, 2.0, 220)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                             no_context=False)
    pipe = nano_ctx.pipeline
    pipe._prompt_past = []
    pipe.full(p, clip)
    dev_past1 = list(pipe._prompt_past)
    pipe.full(p, clip)
    dev_past2 = list(pipe._prompt_past)

    orig = pipe._device_loop_eligible
    pipe._device_loop_eligible = lambda *a, **k: False
    try:
        pipe._prompt_past = []
        pipe.full(p, clip)
        host_past1 = list(pipe._prompt_past)
        pipe.full(p, clip)
        host_past2 = list(pipe._prompt_past)
    finally:
        pipe._device_loop_eligible = orig

    cap = nano_ctx.config.n_text_ctx // 2
    assert dev_past1 == host_past1[-cap:]
    assert dev_past2 == host_past2[-cap:]


def test_initial_prompt_conditioning(nano_ctx, rng):
    clip = _clip(rng, 2.0, 440)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                             initial_prompt="hello world")
    device = pipe_full_fresh(nano_ctx.pipeline, p, clip)
    host = _run_host(nano_ctx, p, clip)
    assert _segs_key(device) == _segs_key(host)


def test_resume_after_window_overflow(nano_ctx, rng):
    """A w_total too small for the clip forces drain + resume rounds; the
    final transcript must be unchanged."""
    from godot_whisper_tpu.parallel.batch import BatchTranscriber
    clip = _clip(rng, 35.0, 220)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)

    bt = BatchTranscriber(nano_ctx)
    want = bt.transcribe([clip], p)[0]

    bt2 = BatchTranscriber(nano_ctx)
    orig = bt2._clip_decoder

    def tiny_w(tparams, B, f_cap, prompt_init, no_timestamps):
        cd = orig(tparams, B, f_cap, prompt_init, no_timestamps)
        if cd.statics.w_total != 1:
            import dataclasses
            from godot_whisper_tpu.decode.clip import ClipDecoder
            statics = dataclasses.replace(cd.statics, w_total=1)
            cd = ClipDecoder(cd.config, cd.fctx, statics,
                             [int(x) for x in np.asarray(cd._init_tokens)])
        return cd

    bt2._clip_decoder = tiny_w
    got = bt2.transcribe([clip], p)[0]
    assert _segs_key(got) == _segs_key(want)


def test_streaming_fill_resume(nano_ctx, rng):
    """Feeding mel incrementally (n_filled/final) and resuming produces the
    same transcript as feeding everything upfront."""
    import jax.numpy as jnp
    from godot_whisper_tpu.parallel.batch import BatchTranscriber
    clip = _clip(rng, 35.0, 220)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)

    pipe = nano_ctx.pipeline
    bt = BatchTranscriber(nano_ctx)
    want = bt.transcribe([clip], p)[0]

    # manual drive: half the frames first, then the rest
    prompt_init, no_ts = bt._prompt_init(p)
    mel_all, n_lens = pipe.mel.device_batch([clip])
    from godot_whisper_tpu.audio.mel import frame_counts
    _, n_len_org = frame_counts(len(clip))
    cd = bt._clip_decoder(p, 1, mel_all.shape[2], prompt_init, no_ts)
    state = cd.init_state(mel_all, n_lens, [0], [n_len_org],
                          n_filled=[n_lens[0] // 2], final=[False])
    state = cd.run(pipe.params, state)
    mid = cd.drain(state)
    assert int(mid.w[0]) >= 1          # made progress on partial audio
    assert not bool(mid.done[0])
    state = state._replace(n_filled=jnp.asarray([n_lens[0]], jnp.int32),
                           final=jnp.asarray([True]))
    state = cd.run(pipe.params, state)
    outs = cd.drain(state)
    assert bool(outs.done[0])

    segments = [[]]
    bt._emit(mid, [clip], segments, prompt_init, p, no_ts,
             [{"t_beg": 0, "t_last": 0, "tid_last": 0}])
    # second drain contains only the windows after the reset-less resume
    # (w keeps counting in the same buffers)
    for k in range(int(mid.w[0]), int(outs.w[0])):
        if bool(outs.emitted[0, k]):
            res = outs.window_result(0, k)
            saved = pipe.segments
            pipe.segments = segments[0]
            pipe._emit_segments(res, 0, [], prompt_init,
                                int(outs.seek[0, k]), p, no_ts)
            pipe.segments = saved
    assert _segs_key(segments[0]) == _segs_key(want)


def test_batch_token_timestamps(nano_ctx, rng):
    """token_timestamps in batch mode (VERDICT round-1 missing #7): must
    run and match the per-stream host pipeline."""
    from godot_whisper_tpu.parallel.batch import BatchTranscriber
    clip = _clip(rng, 2.0, 220)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                             token_timestamps=True)
    bt = BatchTranscriber(nano_ctx)
    got = bt.transcribe([clip, _clip(rng, 2.0, 550)], p)[0]
    want = _run_host(nano_ctx, p, clip)
    assert _segs_key(got) == _segs_key(want)
    gt = [(t.t0, t.t1) for s in got for t in s.tokens]
    wt = [(t.t0, t.t1) for s in want for t in s.tokens]
    assert gt == wt


def test_device_matches_host_beam5(nano_ctx, rng):
    """Beam-5 (the reference's default quality config,
    whisper.cpp:4406) in the device clip loop against the host path."""
    clip = _clip(rng, 2.0, 220)
    p = gwt.TranscribeParams(strategy=gwt.SamplingStrategy.BEAM_SEARCH,
                             beam_size=5, best_of=5,
                             temperature_inc=0.0)
    assert nano_ctx.pipeline._device_loop_eligible(
        p, p.temperatures(), "beam")
    device = pipe_full_fresh(nano_ctx.pipeline, p, clip)
    host = _run_host(nano_ctx, p, clip)
    assert _segs_key(device) == _segs_key(host)


def test_device_matches_host_beam_ladder(nano_ctx, rng):
    """Beam at t=0, best_of samplers on t>0 rungs — device vs host."""
    clip = _clip(rng, 3.0, 330)
    p = gwt.TranscribeParams(strategy=gwt.SamplingStrategy.BEAM_SEARCH,
                             beam_size=3, best_of=3,
                             temperature_inc=0.4, seed=5)
    device = pipe_full_fresh(nano_ctx.pipeline, p, clip)
    host = _run_host(nano_ctx, p, clip)
    assert _segs_key(device) == _segs_key(host)


def test_batch_beam_matches_single(nano_ctx, rng):
    """BatchTranscriber with beam-5 over 2 streams == per-clip device
    decode."""
    from godot_whisper_tpu.parallel.batch import BatchTranscriber
    clips = [_clip(rng, 2.0, 220), _clip(rng, 2.0, 220)]
    p = gwt.TranscribeParams(strategy=gwt.SamplingStrategy.BEAM_SEARCH,
                             beam_size=3, best_of=3,
                             temperature_inc=0.0)
    bt = BatchTranscriber(nano_ctx)
    batched = bt.transcribe(clips, p)
    singles = [pipe_full_fresh(nano_ctx.pipeline, p, c) for c in clips]
    for got, want in zip(batched, singles):
        assert _segs_key(got) == _segs_key(want)


def test_device_matches_host_cross_int8(nano_ctx, rng):
    """int8 cross-KV (TranscribeParams.cross_kv_int8) through the device
    clip loop vs the host path — same quantization, same tokens."""
    clip = _clip(rng, 2.0, 220)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                             cross_kv_int8=True)
    assert nano_ctx.pipeline._device_loop_eligible(
        p, p.temperatures(), "greedy")
    device = pipe_full_fresh(nano_ctx.pipeline, p, clip)
    host = _run_host(nano_ctx, p, clip)
    assert _segs_key(device) == _segs_key(host)


def test_device_beam_cross_int8(nano_ctx, rng):
    """Beam rows + int8 cross-KV (the grouped-repeat quant path) decodes
    and matches the host beam path."""
    clip = _clip(rng, 2.0, 330)
    p = gwt.TranscribeParams(strategy=gwt.SamplingStrategy.BEAM_SEARCH,
                             beam_size=3, best_of=3, temperature_inc=0.0,
                             cross_kv_int8=True)
    device = pipe_full_fresh(nano_ctx.pipeline, p, clip)
    host = _run_host(nano_ctx, p, clip)
    assert _segs_key(device) == _segs_key(host)


@pytest.fixture(scope="module")
def nano_multi_ctx():
    """Multilingual nano: real `tiny` token layout (lang tokens, translate
    task) with scaled-down layers."""
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano-multi")
    assert cfg.is_multilingual
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    return gwt.WhisperContext(pipe)


@pytest.mark.parametrize("translate,language", [(False, "de"),
                                                (True, "fr")])
def test_device_matches_host_multilingual(nano_multi_ctx, rng, translate,
                                          language):
    """Multilingual lang/task prompt prefixes ([sot, lang, task](+not),
    whisper.cpp:5104-5129) through the device clip loop == host path."""
    clip = _clip(rng, 2.0, 220)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                             language=language, translate=translate)
    device = pipe_full_fresh(nano_multi_ctx.pipeline, p, clip)
    host = _run_host(nano_multi_ctx, p, clip)
    assert _segs_key(device) == _segs_key(host)
