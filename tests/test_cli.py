"""CLI tool tests: transcribe outputs, quantize round-trip, server
endpoints, download URL construction."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

import godot_whisper_tpu as gwt


@pytest.fixture(scope="module")
def pico_bin(tmp_path_factory):
    """A tiny real-weight ggml checkpoint on disk (via the exporter)."""
    import jax.numpy as jnp
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import synthetic_vocab
    from godot_whisper_tpu.models import loader_ggml
    from godot_whisper_tpu.models.export_ggml import export_checkpoint
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_audio_head=2,
        n_text_state=64, n_text_head=2, name="pico")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    path = str(tmp_path_factory.mktemp("models") / "pico.bin")
    export_checkpoint(path, params, cfg, mel_filterbank(80),
                      synthetic_vocab(cfg), ttype=loader_ggml.GGML_TYPE_F32)
    return path


def test_cli_transcribe_outputs(pico_bin, tmp_path, rng):
    from godot_whisper_tpu.audio.wav import write_wav
    from godot_whisper_tpu.cli.main import main

    wav = str(tmp_path / "in.wav")
    t = np.arange(2 * 16000) / 16000.0
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32))

    rc = main(["-m", pico_bin, wav, "-otxt", "-osrt", "-oj",
               "--temperature-inc", "0", "--best-of", "1", "--no-prints"])
    assert rc == 0
    assert os.path.exists(wav + ".txt")
    assert os.path.exists(wav + ".srt")
    data = json.loads(open(wav + ".json").read())
    assert "transcription" in data


def test_cli_print_colors(pico_bin, tmp_path, rng, capsys):
    """--print-colors: tokens wrapped in the reference's 10-step
    confidence ramp ANSI codes (examples/main/main.cpp:17-22,:322)."""
    from godot_whisper_tpu.audio.wav import write_wav
    from godot_whisper_tpu.cli.main import main
    from godot_whisper_tpu.cli.outputs import K_COLORS, color_for_p

    assert color_for_p(0.0) == K_COLORS[0]
    assert color_for_p(1.0) == K_COLORS[-1]
    assert color_for_p(0.8) == K_COLORS[int(0.8 ** 3 * 10)]

    wav = str(tmp_path / "c.wav")
    t = np.arange(2 * 16000) / 16000.0
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32))
    rc = main(["-m", pico_bin, wav, "--print-colors",
               "--temperature-inc", "0", "--best-of", "1",
               "--entropy-thold=-1e9", "--logprob-thold=-1e9"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "\033[38;5;" in out and "\033[0m" in out


def test_quantize_roundtrip(pico_bin, tmp_path):
    from godot_whisper_tpu.cli.quantize import main as qmain
    from godot_whisper_tpu.models.loader_ggml import read_checkpoint

    out = str(tmp_path / "pico-q8.bin")
    rc = qmain([pico_bin, out, "q8_0"])
    assert rc == 0
    raw_f = read_checkpoint(pico_bin)
    raw_q = read_checkpoint(out)
    assert raw_q.config.n_vocab == raw_f.config.n_vocab
    w_f = raw_f.tensors["decoder.token_embedding.weight"]
    w_q = raw_q.tensors["decoder.token_embedding.weight"]
    # q8_0: ~0.5% scale quantization error
    np.testing.assert_allclose(w_q, w_f, atol=np.abs(w_f).max() * 0.02)
    # quantized file loads and transcribes
    ctx = gwt.WhisperContext.from_file(out)
    segs = ctx.full(gwt.TranscribeParams(best_of=1, temperature_inc=0.0),
                    np.zeros(2 * 16000, dtype=np.float32))
    assert isinstance(segs, list)


def test_server_endpoints(pico_bin, tmp_path, rng):
    from http.server import ThreadingHTTPServer

    from godot_whisper_tpu.audio.wav import write_wav
    from godot_whisper_tpu.cli.serve import (TranscriptionServer,
                                             make_handler)

    ctx = gwt.WhisperContext.from_file(pico_bin)
    server = TranscriptionServer(ctx)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"

        wav = str(tmp_path / "req.wav")
        t = np.arange(2 * 16000) / 16000.0
        write_wav(wav, (0.3 * np.sin(2 * np.pi * 440 * t)
                        ).astype(np.float32))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inference?temperature=0",
            data=open(wav, "rb").read(), method="POST")
        with urllib.request.urlopen(req) as r:
            data = json.loads(r.read())
        assert "text" in data

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inference?response_format=srt",
            data=open(wav, "rb").read(), method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
    finally:
        httpd.shutdown()


def test_download_urls():
    from godot_whisper_tpu.cli.download import MODELS, model_url
    assert "tiny.en" in MODELS and "large-v3" in MODELS
    assert model_url("tiny.en") == (
        "https://huggingface.co/ggerganov/whisper.cpp/resolve/main/"
        "ggml-tiny.en.bin")


@pytest.mark.parametrize("name", ["base", "small.en", "medium", "large"])
def test_reference_stub_sizes(name):
    from godot_whisper_tpu.models.loader_ggml import read_checkpoint
    path = ("/root/reference/thirdparty/whisper.cpp/models/"
            f"for-tests-ggml-{name}.bin")
    if not os.path.exists(path):
        pytest.skip("stub not available")
    raw = read_checkpoint(path)
    expect = {"base": 6, "small.en": 12, "medium": 24, "large": 32}[name]
    assert raw.config.n_audio_layer == expect
    assert raw.n_loaded == 0


def test_server_micro_batching(pico_bin, tmp_path):
    """Concurrent requests within the batch window decode as one batched
    dispatch and every caller gets its own result."""
    from http.server import ThreadingHTTPServer

    from godot_whisper_tpu.audio.wav import write_wav
    from godot_whisper_tpu.cli.serve import (TranscriptionServer,
                                             make_handler)
    from godot_whisper_tpu.parallel import batch as batch_mod

    ctx = gwt.WhisperContext.from_file(pico_bin)
    server = TranscriptionServer(ctx, batch_window_ms=300, max_batch=4)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    calls = []
    orig = batch_mod.BatchTranscriber.transcribe

    def spy(self, clips, tparams=None):
        calls.append(len(clips))
        return orig(self, clips, tparams)

    batch_mod.BatchTranscriber.transcribe = spy
    try:
        wavs = []
        for i in range(3):
            wav = str(tmp_path / f"req{i}.wav")
            t = np.arange(16000) / 16000.0
            write_wav(wav, (0.3 * np.sin(2 * np.pi * (300 + 100 * i) * t)
                            ).astype(np.float32))
            wavs.append(open(wav, "rb").read())

        results = [None] * 3

        def post(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/inference?temperature=0",
                data=wavs[i], method="POST")
            with urllib.request.urlopen(req) as r:
                results[i] = json.loads(r.read())

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(120)
        assert all(r is not None and "text" in r for r in results)
        # at least one dispatch carried multiple requests
        assert max(calls) >= 2, calls
    finally:
        batch_mod.BatchTranscriber.transcribe = orig
        httpd.shutdown()


def test_bench_sweep_csv(tmp_path, monkeypatch):
    """The model x batch sweep (extra/bench.py analogue) writes a CSV."""
    import io

    from godot_whisper_tpu.cli import bench as bench_cli
    from godot_whisper_tpu.models import config as config_mod

    # shrink tiny.en so the CPU sweep is fast
    nano = gwt.get_config("tiny.en").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=128,
        n_audio_head=4, n_text_state=128, n_text_head=4, name="nano")
    monkeypatch.setattr(config_mod, "get_config", lambda name: nano)
    import godot_whisper_tpu
    monkeypatch.setattr(godot_whisper_tpu, "get_config", lambda name: nano)

    out = io.StringIO()
    bench_cli.bench_sweep(["tiny.en"], [1, 2], 1.0, out)
    lines = out.getvalue().strip().splitlines()
    assert lines[0].startswith("model,batch")
    assert len(lines) == 3
    assert lines[1].split(",")[0] == "tiny.en"
