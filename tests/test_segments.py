"""Segment-emission unit tests: crafted WindowResult arrays through
_emit_segments must reproduce the reference's splitting semantics
(whisper.cpp:5673-5797)."""

import numpy as np
import pytest

import godot_whisper_tpu as gwt
from godot_whisper_tpu.decode.window import WindowResult


@pytest.fixture(scope="module")
def pipe():
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_audio_head=2,
        n_text_state=64, n_text_head=2, name="pico")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    tok = Tokenizer(cfg, synthetic_vocab(cfg))
    return WhisperPipeline(cfg, params, tok, mel_filterbank(80), n_loaded=1)


def _result(tokens, tids, seek_delta=3000):
    n = len(tokens)
    r = WindowResult(
        tokens=np.asarray([tokens], dtype=np.int32),
        tok_p=np.full((1, n), 0.9, np.float32),
        tok_plog=np.full((1, n), -0.1, np.float32),
        tok_pt=np.full((1, n), 0.5, np.float32),
        tok_ptsum=np.full((1, n), 0.9, np.float32),
        tok_tid=np.asarray([tids], dtype=np.int32),
        completed=np.asarray([True]),
        failed=np.asarray([False]),
        has_ts=np.asarray([True]),
        seek_delta=np.asarray([seek_delta], dtype=np.int32),
        result_len=np.asarray([n], dtype=np.int32),
        sum_logprobs_all=np.asarray([-0.1 * n], dtype=np.float32),
        n_steps=n)
    return r


def test_two_segments_split_on_timestamp_pairs(pipe):
    """[ts0] text [ts1][ts2] text [ts3] -> two segments with ts-derived
    boundaries (t = seek + 2*(tid - beg))."""
    cfg = pipe.config
    beg = cfg.token_beg
    ids = [beg, ord("H"), ord("i"), beg + 50, beg + 50,
           ord("Y"), ord("o"), beg + 100]
    tids = [beg, beg, beg, beg + 50, beg + 50, beg + 50, beg + 50,
            beg + 100]
    pipe.segments = []
    p = gwt.TranscribeParams()
    seek_delta, prompt_past = pipe._emit_segments(
        _result(ids, tids), 0, [cfg.token_sot], [cfg.token_sot], 0, p,
        False)
    assert len(pipe.segments) == 2
    s0, s1 = pipe.segments
    assert s0.text == "Hi"
    assert (s0.t0, s0.t1) == (0, 100)        # 2*(tid-beg)
    assert s1.text == "Yo"
    assert (s1.t0, s1.t1) == (100, 200)
    # prompt_past = all result tokens (whisper.cpp:5690-5692)
    assert prompt_past == ids


def test_trailing_text_uses_seek_delta(pipe):
    """Text with no closing timestamp ends at seek + seek_delta
    (whisper.cpp:5763-5764)."""
    cfg = pipe.config
    beg = cfg.token_beg
    ids = [beg, ord("A"), ord("b")]
    tids = [beg, beg, beg]
    pipe.segments = []
    p = gwt.TranscribeParams()
    seek = 500
    seek_delta, _ = pipe._emit_segments(
        _result(ids, tids, seek_delta=280), 0, [cfg.token_sot],
        [cfg.token_sot], seek, p, False)
    assert seek_delta == 280
    assert len(pipe.segments) == 1
    assert pipe.segments[0].t0 == 500
    assert pipe.segments[0].t1 == 500 + 280


def test_single_segment_mode_no_split(pipe):
    """single_segment=True never splits on timestamp pairs
    (whisper.cpp:5715)."""
    cfg = pipe.config
    beg = cfg.token_beg
    ids = [beg, ord("A"), beg + 10, beg + 10, ord("B"), beg + 20]
    tids = [beg, beg, beg + 10, beg + 10, beg + 10, beg + 20]
    pipe.segments = []
    p = gwt.TranscribeParams(single_segment=True)
    pipe._emit_segments(_result(ids, tids, seek_delta=3000), 0,
                        [cfg.token_sot], [cfg.token_sot], 0, p, False)
    assert len(pipe.segments) == 1
    assert pipe.segments[0].text == "AB"


def test_prompt_past_carries_prev_context(pipe):
    """With a [prev]-prefixed prompt, the context tokens re-enter
    prompt_past before the new tokens (whisper.cpp:5684-5692)."""
    cfg = pipe.config
    beg = cfg.token_beg
    ids = [beg, ord("Z"), beg + 5]
    tids = [beg, beg, beg + 5]
    pipe.segments = []
    p = gwt.TranscribeParams()
    prev_ctx = [101, 102, 103]
    prompt = [cfg.token_prev] + prev_ctx + [cfg.token_sot]
    _, prompt_past = pipe._emit_segments(
        _result(ids, tids), 0, prompt, [cfg.token_sot], 0, p, False)
    assert prompt_past == prev_ctx + ids


def test_empty_result_no_segments(pipe):
    cfg = pipe.config
    pipe.segments = []
    p = gwt.TranscribeParams()
    r = _result([], [])
    seek_delta, prompt_past = pipe._emit_segments(
        r, 0, [cfg.token_sot], [cfg.token_sot], 0, p, False)
    assert pipe.segments == []
    assert seek_delta == 3000
