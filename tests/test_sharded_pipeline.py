"""End-to-end pipeline under tensor-parallel sharding: the full() seek loop
with the in-jit window decoder must run (and match) with params sharded
over a ("dp","tp") mesh — the single-controller shape of large-v3 serving
(BASELINE config 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import godot_whisper_tpu as gwt
from godot_whisper_tpu.audio.mel import mel_filterbank
from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
from godot_whisper_tpu.decode.loop import WhisperPipeline
from godot_whisper_tpu.models.params import init_params
from godot_whisper_tpu.parallel.sharding import make_mesh, shard_params

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _build(params, cfg):
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    return gwt.WhisperContext(pipe)


def test_full_pipeline_tp_sharded(rng):
    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)

    audio = (0.3 * rng.standard_normal(3 * 16000)).astype(np.float32)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0)

    ctx_plain = _build(params, cfg)
    plain = [s.text for s in ctx_plain.full(p, audio)]

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh, cfg)
    ctx_sh = _build(sharded, cfg)
    got = [s.text for s in ctx_sh.full(p, audio)]

    assert got == plain


def test_beam_tp4_realistic_heads_clip_loop(rng):
    """tp=4 at a REALISTIC head count (20 heads = large/large-v3,
    VERDICT r4 ask #7): the device clip loop with beam-5 must produce
    token-identical raw windows vs unsharded, and the compiled HLO must
    keep the KV caches and per-step logits sharded — the only
    all-gathers allowed are window-level activation gathers at the
    Megatron column->row boundaries (<= 2*audio_ctx * n_state elements,
    the conv-stem width; the KV caches (L*B*C*S = 3.6M elements here)
    or the (B, V) logits (1.3M) would exceed that).

    Measured collective census at pinning time (XLA CPU, dp=2 x tp=4):
    20 all-gathers / 32 all-reduces in the whole clip loop — bounds
    asserted with slack for compiler drift."""
    import re

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=160,
        n_audio_head=20, n_text_state=160, n_text_head=20, name="nano20")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    t = np.arange(3 * 16000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 300 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
    p = gwt.TranscribeParams(
        strategy=gwt.SamplingStrategy.BEAM_SEARCH, beam_size=5,
        best_of=5, temperature_inc=0.0, entropy_thold=-1e9,
        logprob_thold=-1e9, print_progress=False)

    def raw_windows(ctx):
        pipe = ctx.pipeline
        pipe.set_audio(audio)
        cd = pipe._clip_decoder(p, [0.0], [cfg.token_sot], False,
                                pipe._mel_device.shape[1])
        state = cd.init_state(pipe._mel_device[None], [pipe._mel_n_len],
                              [0], [pipe._n_len_org], past_init=[[]])
        state = cd.run(pipe.params, state)
        outs = cd.drain(state)
        wins = [outs.tokens[0, k, :int(outs.rl[0, k])].tolist()
                for k in range(int(outs.w[0]))]
        return wins, cd, state

    plain, _, _ = raw_windows(_build(params, cfg))

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh, cfg)
    ctx_sh = _build(sharded, cfg)
    got, cd, state = raw_windows(ctx_sh)

    assert plain and any(len(w) > 0 for w in plain), plain
    assert got == plain

    txt = cd._loop.lower(sharded, state, cd.fctx.static_suppress,
                         cd._init_tokens, cd._temps_arr,
                         cd._use_past_arr).compile().as_text()
    cap = 2 * cfg.n_audio_ctx * cfg.n_audio_state   # 480k (conv stem)
    ags = re.findall(r"all-gather[^=]*= \w+\[([0-9,]*)\]", txt)
    for dims in ags:
        n = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
        assert n <= cap, f"cache/logit-sized all-gather in HLO: [{dims}]"
    n_ag = len(ags)
    n_ar = len(re.findall(r"all-reduce(?:-start)?\(", txt))
    assert 0 < n_ag <= 48, n_ag
    assert 0 < n_ar <= 80, n_ar


def test_beam_pipeline_tp_sharded(rng):
    cfg = gwt.get_config("tiny").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano-multi")
    params = init_params(cfg, seed=1, compute_dtype=jnp.float32)
    audio = (0.3 * rng.standard_normal(2 * 16000)).astype(np.float32)
    p = gwt.beam_params(beam_size=2, best_of=2, temperature_inc=0.0,
                        language="en")

    ctx_plain = _build(params, cfg)
    plain = [s.text for s in ctx_plain.full(p, audio)]

    mesh = make_mesh(dp=1, tp=8)
    sharded = shard_params(params, mesh, cfg)
    ctx_sh = _build(sharded, cfg)
    got = [s.text for s in ctx_sh.full(p, audio)]
    assert got == plain
