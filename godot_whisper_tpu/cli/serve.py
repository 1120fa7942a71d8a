"""HTTP transcription server — the ``examples/server`` equivalent
(/root/reference/thirdparty/whisper.cpp/examples/server/server.cpp).

Endpoints (mirroring the reference's):
  POST /inference   body = WAV bytes (or multipart field "file");
                    query/form params: language, translate, beam_size,
                    best_of, temperature, response_format (json|text|srt|
                    vtt|verbose_json)
  POST /load        {"model": "path.bin"} — swap the loaded model
  GET  /health      liveness probe

stdlib http.server only; one worker thread serializes device work (the
same whisper_context-not-thread-safe contract as the reference,
whisper.h:44-45).
"""

from __future__ import annotations

import argparse
import io
import json
import re
import sys
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _parse_multipart(body: bytes, content_type: str):
    """Minimal multipart/form-data parser returning {name: bytes}."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return {}
    boundary = ("--" + m.group(1)).encode()
    parts = body.split(boundary)
    out = {}
    for part in parts:
        if b"\r\n\r\n" not in part:
            continue
        head, _, payload = part.partition(b"\r\n\r\n")
        name_m = re.search(rb'name="([^"]+)"', head)
        if not name_m:
            continue
        payload = payload.rstrip(b"\r\n-")
        out[name_m.group(1).decode()] = payload
    return out


class TranscriptionServer:
    """``batch_window_ms > 0`` enables DYNAMIC MICRO-BATCHING — the
    TPU-native serving mode the reference's one-thread server cannot
    express: concurrent requests arriving within the window that share
    decode parameters are stacked on the stream axis and decoded as ONE
    batched device clip-loop dispatch (parallel/batch.py), multiplying
    served audio-s/s at the same per-request latency budget."""

    def __init__(self, ctx, batch_window_ms: float = 0.0,
                 max_batch: int = 8):
        self.ctx = ctx
        self.lock = threading.Lock()  # serialize device access
        self.batch_window = batch_window_ms / 1e3
        self.max_batch = max_batch
        self._bt = None
        self._queue = None
        if self.batch_window > 0:
            import queue as _q
            self._queue = _q.Queue()
            self._carry = []
            t = threading.Thread(target=self._dispatch_loop, daemon=True)
            t.start()

    # ------------------------------------------------------- micro-batching
    @staticmethod
    def _batch_key(tp):
        return (tp.strategy, tp.language, tp.translate, tp.best_of,
                tp.beam_size, tp.temperature, tp.initial_prompt)

    def _transcribe(self, samples, tparams):
        if self._queue is None:
            with self.lock:
                return self.ctx.full(tparams, samples)
        req = {"samples": samples, "tp": tparams,
               "ev": threading.Event(), "out": None, "err": None}
        self._queue.put(req)
        req["ev"].wait()
        if req["err"] is not None:
            raise req["err"]
        return req["out"]

    def _dispatch_loop(self):
        import time as _time
        from godot_whisper_tpu.parallel.batch import BatchTranscriber
        while True:
            group = [self._carry.pop(0) if self._carry
                     else self._queue.get()]
            key = self._batch_key(group[0]["tp"])
            deadline = _time.perf_counter() + self.batch_window
            while len(group) < self.max_batch:
                rem = deadline - _time.perf_counter()
                nxt = None
                for i, c in enumerate(self._carry):
                    if self._batch_key(c["tp"]) == key:
                        nxt = self._carry.pop(i)
                        break
                if nxt is None:
                    if rem <= 0:
                        break
                    try:
                        cand = self._queue.get(timeout=rem)
                    except Exception:
                        break
                    if self._batch_key(cand["tp"]) == key:
                        nxt = cand
                    else:
                        self._carry.append(cand)
                        continue
                group.append(nxt)
            try:
                with self.lock:
                    if self._bt is None or self._bt.ctx is not self.ctx:
                        self._bt = BatchTranscriber(self.ctx)
                    results = self._bt.transcribe(
                        [g["samples"] for g in group], group[0]["tp"])
                for g, segs in zip(group, results):
                    g["out"] = segs
            except Exception as e:  # pragma: no cover
                for g in group:
                    g["err"] = e
            for g in group:
                g["ev"].set()

    def handle_inference(self, audio_bytes: bytes, params: dict) -> tuple:
        import numpy as np

        import godot_whisper_tpu as gwt
        from godot_whisper_tpu.audio.resample import resample
        from godot_whisper_tpu.audio.wav import read_wav
        from godot_whisper_tpu.cli import outputs

        # decode WAV from memory
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(audio_bytes)
            f.flush()
            samples, rate = read_wav(f.name)
        if rate != gwt.SAMPLE_RATE:
            samples = resample(samples, rate, gwt.SAMPLE_RATE)

        beam_size = int(params.get("beam_size", -1))
        strategy = (gwt.SamplingStrategy.BEAM_SEARCH if beam_size > 1
                    else gwt.SamplingStrategy.GREEDY)
        tparams = gwt.TranscribeParams(
            strategy=strategy,
            language=params.get("language", "en"),
            translate=params.get("translate", "false") == "true",
            best_of=int(params.get("best_of", 5)),
            beam_size=beam_size if beam_size > 1 else 5,
            temperature=float(params.get("temperature", 0.0)),
            initial_prompt=params.get("prompt") or None,
            print_progress=False,
        )
        segments = self._transcribe(samples, tparams)

        fmt = params.get("response_format", "json")
        if fmt == "text":
            return outputs.to_txt(segments), "text/plain"
        if fmt == "srt":
            return outputs.to_srt(segments), "text/plain"
        if fmt == "vtt":
            return outputs.to_vtt(segments), "text/plain"
        if fmt == "verbose_json":
            return outputs.to_json(
                segments, model_name=self.ctx.config.name,
                language=tparams.language, full=True), "application/json"
        return (json.dumps({"text": "".join(s.text for s in segments)})
                + "\n", "application/json")

    def handle_load(self, body: dict) -> dict:
        import godot_whisper_tpu as gwt
        path = body["model"]
        with self.lock:
            self.ctx = gwt.WhisperContext.from_file(path)
        return {"status": "ok", "model": self.ctx.config.name}


def make_handler(server: TranscriptionServer):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: str,
                  ctype: str = "application/json"):
            data = payload.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path.startswith("/health"):
                self._send(200, '{"status":"ok"}\n')
            else:
                self._send(404, '{"error":"not found"}\n')

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            parsed = urllib.parse.urlparse(self.path)
            params = {k: v[0] for k, v in
                      urllib.parse.parse_qs(parsed.query).items()}

            try:
                if parsed.path == "/inference":
                    ctype = self.headers.get("Content-Type", "")
                    audio = body
                    if ctype.startswith("multipart/form-data"):
                        fields = _parse_multipart(body, ctype)
                        audio = fields.pop("file", b"")
                        params.update({k: v.decode() for k, v in
                                       fields.items()})
                    if not audio:
                        self._send(400, '{"error":"no audio"}\n')
                        return
                    payload, ctype_out = server.handle_inference(audio,
                                                                 params)
                    self._send(200, payload, ctype_out)
                elif parsed.path == "/load":
                    result = server.handle_load(json.loads(body or b"{}"))
                    self._send(200, json.dumps(result) + "\n")
                else:
                    self._send(404, '{"error":"not found"}\n')
            except Exception as e:  # surface errors as JSON, keep serving
                self._send(500, json.dumps({"error": str(e)}) + "\n")

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gwt-serve")
    p.add_argument("-m", "--model", default=None, help="ggml model path")
    p.add_argument("--synthetic", default=None, metavar="NAME")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help="micro-batch concurrent requests arriving within "
                        "this window into one batched device dispatch "
                        "(0 = off)")
    p.add_argument("--max-batch", type=int, default=8)
    args = p.parse_args(argv)

    import godot_whisper_tpu as gwt
    if args.synthetic:
        ctx = gwt.WhisperContext.synthetic(args.synthetic)
    elif args.model:
        ctx = gwt.WhisperContext.from_file(args.model)
    else:
        print("error: need -m or --synthetic", file=sys.stderr)
        return 1

    server = TranscriptionServer(ctx,
                                 batch_window_ms=args.batch_window_ms,
                                 max_batch=args.max_batch)
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(server))
    print(f"listening on http://{args.host}:{args.port}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
