"""Benchmark CLI — the ``examples/bench`` + in-library microbench
equivalents (/root/reference/thirdparty/whisper.cpp/examples/bench/bench.cpp
encoder-only timing; whisper_bench_memcpy / whisper_bench_ggml_mul_mat,
whisper.cpp:6027-6296).

    python -m godot_whisper_tpu.cli.bench --what encoder -m tiny.en
    python -m godot_whisper_tpu.cli.bench --what memcpy
    python -m godot_whisper_tpu.cli.bench --what matmul
    python -m godot_whisper_tpu.cli.bench --what e2e
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def bench_memcpy() -> None:
    """Device HBM copy bandwidth + host<->device transfer (the memcpy
    bench, whisper.cpp:6027-6075, re-aimed at what matters on TPU)."""
    import jax
    import jax.numpy as jnp

    n = 256 * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)
    jax.block_until_ready(x)

    @jax.jit
    def copy(x):
        return x + 0.0

    y = copy(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(8):
        y = copy(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / 8
    gb = n * 4 * 2 / 1e9
    print(f"device copy: {gb / dt:7.2f} GB/s")

    host = np.ones(32 * 1024 * 1024 // 4, dtype=np.float32)
    t0 = time.perf_counter()
    d = jnp.asarray(host)
    jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    print(f"host->device: {host.nbytes / 1e9 / dt:7.2f} GB/s")
    t0 = time.perf_counter()
    _ = np.asarray(d)
    dt = time.perf_counter() - t0
    print(f"device->host: {host.nbytes / 1e9 / dt:7.2f} GB/s")


def bench_matmul() -> None:
    """GEMM sweep 64..4096 in f32/bf16/int8 (whisper_bench_ggml_mul_mat's
    role, whisper.cpp:6096-6296)."""
    import jax
    import jax.numpy as jnp

    for size in (64, 128, 256, 512, 1024, 2048, 4096):
        for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16"),
                            (jnp.int8, "int8")):
            if dtype == jnp.int8:
                a = jnp.ones((size, size), jnp.int8)
                b = jnp.ones((size, size), jnp.int8)

                @jax.jit
                def mm(a, b):
                    return jax.lax.dot_general(
                        a, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            else:
                a = jnp.ones((size, size), dtype)
                b = jnp.ones((size, size), dtype)

                @jax.jit
                def mm(a, b):
                    return jnp.dot(a, b,
                                   preferred_element_type=jnp.float32)

            out = mm(a, b)
            jax.block_until_ready(out)
            n_iter = max(4, 2048 // max(1, size // 64))
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = mm(a, b)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n_iter
            gflops = 2 * size ** 3 / dt / 1e9
            print(f"{size:5d} x {size:5d}: {name:5s} {gflops:10.1f} GFLOPS")


def bench_encoder(model: str, n_iter: int) -> None:
    """Encoder-only wall time (examples/bench semantics)."""
    import jax
    import jax.numpy as jnp

    import godot_whisper_tpu as gwt

    ctx = gwt.WhisperContext.synthetic(model)
    pipe = ctx.pipeline
    pipe.set_audio(np.zeros(30 * 16000, dtype=np.float32))
    pipe.encode_window(0)  # compile
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pipe.encode_window(0)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{model} encoder: {dt * 1000:8.2f} ms / 30 s window "
          f"({30.0 / dt:8.1f}x realtime encode)")


def _loop_time(step, x0, consts=(), iters: int = 1000) -> float:
    """Per-iteration device time of ``x = step(x, *consts)`` amortized over
    ``iters`` chained executions inside ONE jit.

    Synchronization is a 4-byte device_get of a reduction of the result —
    on tunneled runtimes ``block_until_ready`` does NOT round-trip (it
    reported a 3.6 GFLOP attention at 6x chip peak), so the only reliable
    fence is pulling data.  The measured host round trip (timed on a
    trivial executable) is subtracted."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x, *consts):
        x = lax.fori_loop(0, iters, lambda i, x: step(x, *consts), x)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def trivial(x):
        return jnp.sum(x.astype(jnp.float32))

    float(run(x0, *consts))     # compile + warm
    float(trivial(x0))
    rtt = float("inf")
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(x0))
        rtt = min(rtt, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run(x0, *consts))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / iters


def bench_kernels() -> None:
    """Roofline suite: per-kernel achieved FLOPS / bandwidth vs chip peak
    (the whisper_bench_ggml_mul_mat analogue, whisper.cpp:6060-6296).

    Prints one JSON line per kernel.  Peaks default to TPU v5e
    (197 TFLOPS bf16, 819 GB/s HBM); override with GWT_PEAK_FLOPS /
    GWT_PEAK_BW for other chips.
    """
    import json
    import os

    import jax
    import jax.numpy as jnp

    from godot_whisper_tpu.ops import attention
    from godot_whisper_tpu.ops.qmatmul import (quant_matmul, quant_matmul4,
                                               quantize_tensor,
                                               quantize_tensor4)

    peak_flops = float(os.environ.get("GWT_PEAK_FLOPS", 197e12))
    peak_bw = float(os.environ.get("GWT_PEAK_BW", 819e9))
    rng = np.random.default_rng(0)

    def emit(kernel, us, value, unit, peak):
        print(json.dumps({
            "kernel": kernel, "us_per_call": round(us * 1e6, 1),
            "achieved": round(value / 1e9, 1), "unit": unit,
            "roofline_frac": round(value / peak, 3)}), flush=True)

    # ---- encoder self-attention: flash kernel vs einsum across model
    # sizes (H heads) and batch (VERDICT r3 #5 asked for real-shape
    # coverage before defaulting either path).  Measures the PRODUCTION
    # entry flash_attention_bh on the head-major (BH, T, D) layout the
    # encoder's projections now produce for free (models/model.py folds
    # the head transposes into the q/k/v and out-proj einsums — r5);
    # T = 1500 padded to 1536 inside the wrapper.
    def emit_enc(tag, B, H):
        import os as _os
        # production layout since the r5 pad-native encoder: the
        # residual stream rides at T_pad = 1536 with t_valid = 1500 key
        # masking (models/model.py pads once per window), so the kernel
        # sees block-aligned operands and the wrapper never pads/slices
        T, TV, D = 1536, 1500, 64
        q = jnp.asarray(rng.standard_normal((B * H, T, D))
                        .astype(np.float32)).astype(jnp.bfloat16)
        k, v = q + 0.1, q - 0.1
        flops = 4 * B * H * 1536 * 1536 * D

        def step_flash(x, k, v):
            return attention.flash_attention_bh(x, k, v, t_valid=TV
                                                ).astype(x.dtype)

        _os.environ["GWT_ENC_ATTN"] = "flash"
        try:
            us = _loop_time(step_flash, q, (k, v))
        finally:
            _os.environ.pop("GWT_ENC_ATTN", None)
        emit(f"flash_attention ({B * H},1536,{D}) [{tag}]", us,
             flops / us, "GFLOPS", peak_flops)

        _os.environ["GWT_ENC_ATTN"] = "einsum"
        try:
            us = _loop_time(step_flash, q, (k, v))
        finally:
            _os.environ.pop("GWT_ENC_ATTN", None)
        emit(f"einsum_attention ({B * H},1536,{D}) [{tag}]", us,
             flops / us, "GFLOPS", peak_flops)

    emit_enc("tiny b1", 1, 6)
    emit_enc("base b1", 1, 8)
    emit_enc("small b1", 1, 12)
    emit_enc("large-v3 b1", 1, 20)
    emit_enc("tiny b8", 8, 6)
    emit_enc("large-v3 b8", 8, 20)

    # ---- weight-quantized matmul: large-v3 MLP-down shape, decode batch 8
    S, O, B = 5120, 1280, 8
    w = rng.standard_normal((S, O)).astype(np.float32) * 0.02
    x0 = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    wb = jnp.asarray(w).astype(jnp.bfloat16)

    def step_bf16(x, wb):
        y = jnp.dot(x, wb, preferred_element_type=jnp.float32)
        return x + (jnp.sum(y) * 1e-30).astype(x.dtype)

    us = _loop_time(step_bf16, x0, (wb,))
    emit(f"matmul bf16 ({S}x{O}, B={B})", us, S * O * 2 / us, "GB/s",
         peak_bw)

    qt8 = quantize_tensor(jnp.asarray(w), reduce_axis=0)

    def step_q8(x, q, s):
        from godot_whisper_tpu.ops.qmatmul import QuantTensor
        y = quant_matmul(x, QuantTensor(q, s))
        return x + (jnp.sum(y) * 1e-30).astype(x.dtype)

    us = _loop_time(step_q8, x0, (qt8.q, qt8.s))
    emit(f"quant_matmul int8 ({S}x{O}, B={B})", us, S * O / us, "GB/s",
         peak_bw)

    qt4 = quantize_tensor4(jnp.asarray(w))

    def step_q4(x, q, s):
        from godot_whisper_tpu.ops.qmatmul import Quant4Tensor
        y = quant_matmul4(x, Quant4Tensor(q, s))
        return x + (jnp.sum(y) * 1e-30).astype(x.dtype)

    us = _loop_time(step_q4, x0, (qt4.q, qt4.s))
    emit(f"quant_matmul4 int4 ({S}x{O}, B={B})", us, S * O // 2 / us,
         "GB/s", peak_bw)

    # ---- decode-step attention: the per-token hot kernel
    from godot_whisper_tpu.ops.decode_attention import (decode_attention,
                                                        _fallback)

    def emit_dattn(tag, B, C, S, H, quant=False, grp=1):
        q0 = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32))
        kb = jnp.asarray(rng.standard_normal(
            (B // grp, C, S)).astype(np.float32)).astype(jnp.bfloat16)
        vb = kb + 0.1
        lo = jnp.full((B,), C - 36, jnp.int32)   # ~audio_ctx valid
        nbytes = 2 * (B // grp) * C * S * (1 if quant else 2)
        if quant:
            from godot_whisper_tpu.ops.cross_attention import (
                cross_attention_quant)
            kq = jnp.clip(kb.astype(jnp.float32) * 64, -127,
                          127).astype(jnp.int8)
            ks = jnp.full((B, C, 128), 1 / 64, jnp.bfloat16)
            vs = jnp.full((B, 128), 1 / 64, jnp.float32)

            def step(x, kq, ks, vs):
                o = cross_attention_quant(x, kq, ks, kq, vs, n_head=H,
                                          t_valid=lo)
                return x + o * 1e-30

            us = _loop_time(step, q0, (kq, ks, vs), iters=500)
        else:
            def step(x, kb, vb):
                o = decode_attention(x, kb, vb, lo, jnp.int32(0),
                                     split=C, n_head=H, kv_group=grp)
                return x + o * 1e-30

            us = _loop_time(step, q0, (kb, vb), iters=500)
        emit(tag, us, nbytes / us, "GB/s", peak_bw)

        def step_e(x, kb, vb):
            o = _fallback(x, kb, vb, lo, jnp.int32(0), C, H, kv_group=grp)
            return x + o * 1e-30

        if not quant:
            us = _loop_time(step_e, q0, (kb, vb), iters=500)
            emit(tag + " [einsum]", us, nbytes / us, "GB/s", peak_bw)

    emit_dattn("decode_attn tiny self (B=8,C=512,S=384)", 8, 512, 384, 6)
    emit_dattn("decode_attn large cross (B=8,C=1536,S=1280)",
               8, 1536, 1280, 20)
    emit_dattn("decode_attn large cross int8 (B=8)", 8, 1536, 1280, 20,
               quant=True)
    emit_dattn("decode_attn beam5 grouped (B=40,grp=5,C=1536,S=384)",
               40, 1536, 384, 6, grp=5)

    # ---- split prompt/live beam self-attention (the r4 beam cache)
    from godot_whisper_tpu.ops.split_attention import split_beam_attention
    Ls, Gs, Ks, CPs, NLs, Ss = 4, 8, 5, 256, 256, 384
    Bs = Gs * Ks
    kp_ = jnp.asarray(rng.standard_normal(
        (Ls, Gs, CPs, Ss)).astype(np.float32)).astype(jnp.bfloat16)
    vp_ = kp_ + 0.1
    kl_ = jnp.asarray(rng.standard_normal(
        (Ls, Bs, NLs, Ss)).astype(np.float32)).astype(jnp.bfloat16)
    vl_ = kl_ + 0.1
    qs_ = jnp.asarray(rng.standard_normal((Bs, Ss)).astype(np.float32))
    los_ = jnp.full((Bs,), 227, jnp.int32)
    # bytes: prompt read once per group + live per beam (one layer)
    sp_bytes = (2 * Gs * CPs * Ss + 2 * Bs * 128 * Ss) * 2

    def step_sp(x):
        o = split_beam_attention(x, kp_, vp_, kl_, vl_, los_,
                                 jnp.int32(110), n_head=6, kv_group=Ks,
                                 layer=jnp.int32(1))
        return x + o * 1e-30

    us = _loop_time(step_sp, qs_, (), iters=500)
    emit("split_beam_attn (B=40,grp=5,CP=256,live=110)", us,
         sp_bytes / us, "GB/s", peak_bw)

    # ---- bounded beam KV reorder vs the full-batch gather
    from godot_whisper_tpu.ops.kv_reorder import reorder_kv_live
    L_, B_, C_, S_ = 4, 40, 512, 384
    kcache = jnp.asarray(rng.standard_normal(
        (L_, B_, C_, S_)).astype(np.float32)).astype(jnp.bfloat16)
    vcache = kcache + 0.1
    srcb = jnp.asarray(rng.integers(0, B_, B_), jnp.int32)
    hi_mid = jnp.int32(300)   # mid-window live prefix
    live_bytes = 2 * 2 * L_ * B_ * 300 * S_ * 2

    def step_ro(x, v):
        k2, v2 = reorder_kv_live(x, v, srcb, hi_mid)
        return k2, v2

    @jax.jit
    def run_ro(k, v):
        import jax.lax as _lax
        k, v = _lax.fori_loop(0, 200, lambda i, kv: step_ro(*kv), (k, v))
        return jnp.sum(k[0, 0, 0, :8].astype(jnp.float32))

    @jax.jit
    def run_tk(k, v):
        import jax.lax as _lax
        k, v = _lax.fori_loop(
            0, 200, lambda i, kv: (jnp.take(kv[0], srcb, axis=1),
                                   jnp.take(kv[1], srcb, axis=1)), (k, v))
        return jnp.sum(k[0, 0, 0, :8].astype(jnp.float32))

    @jax.jit
    def triv_ro(k, v):
        return jnp.sum(k[0, 0, 0, :8].astype(jnp.float32))

    import time as _t
    for name, fn in (("kv_reorder bounded (L4,B40,C512,hi=300)", run_ro),
                     ("kv_reorder full take (L4,B40,C512)", run_tk)):
        float(fn(kcache, vcache)); float(triv_ro(kcache, vcache))
        rtt = best = float("inf")
        for _ in range(4):
            t0 = _t.perf_counter(); float(triv_ro(kcache, vcache))
            rtt = min(rtt, _t.perf_counter() - t0)
            t0 = _t.perf_counter(); float(fn(kcache, vcache))
            best = min(best, _t.perf_counter() - t0)
        us = max(best - rtt, 1e-9) / 200
        emit(name, us, live_bytes / us, "GB/s", peak_bw)

    # ---- fused filter+sample over the full vocab
    from godot_whisper_tpu.ops.filter_sample import fused_filter_sample
    B, V = 8, 51864
    logits0 = jnp.asarray(
        rng.standard_normal((B, V)).astype(np.float32))
    sup = jnp.zeros((V,), bool)

    def step_fs(lg, sup):
        out = fused_filter_sample(
            lg, sup,
            is_initial=jnp.zeros((B,), bool),
            last_token=jnp.full((B,), 100, jnp.int32),
            penult_token=jnp.full((B,), 90, jnp.int32),
            n_tokens=jnp.full((B,), 5, jnp.int32),
            has_ts=jnp.zeros((B,), bool),
            seek_delta=jnp.full((B,), 3000, jnp.int32),
            temperature=jnp.float32(0.0),
            seeds=jnp.arange(B, dtype=jnp.int32),
            eot=50256, beg=50363, space_id=220, max_initial_tid=50413,
            suppress_blank=True, no_timestamps=False, argmax_sample=True)
        return lg + (out.plog * 1e-30)[:, None]

    us = _loop_time(step_fs, logits0, (sup,), iters=500)
    emit(f"fused_filter_sample (B={B}, V={V})", us, B * V * 4 / us,
         "GB/s", peak_bw)

    # ---- mel frontend: 30 s window, pallas kernel vs jnp matmul path
    from godot_whisper_tpu.audio import mel as melmod
    from godot_whisper_tpu.ops import mel_kernel
    filters = melmod.mel_filterbank(80)
    padded = melmod.pad_audio(np.zeros(30 * 16000, np.float32))
    bucket = -(-len(padded) // melmod._CHUNK) * melmod._CHUNK
    padded = np.pad(padded, (0, bucket - len(padded))).astype(np.float16)
    L = len(padded)
    n_frames = (L - 400) // 160 + 1
    mel_flops = 2 * n_frames * 480 * 512 + 2 * n_frames * 256 * 128
    x0 = jnp.asarray(padded)[None]
    basis = mel_kernel.dft_basis_512()
    filt = mel_kernel.pad_filters_256(filters)

    def step_mel_pallas(x, basis, filt):
        out = mel_kernel._log_mel_pallas(x, basis, filt, n_frames, 80)
        return x + jnp.mean(out).astype(x.dtype) * 1e-30

    us = _loop_time(step_mel_pallas, x0, (basis, filt), iters=200)
    emit("mel pallas (30s)", us, mel_flops / us, "GFLOPS", peak_flops)

    jb = melmod._windowed_dft_basis()
    jf = jnp.asarray(melmod._pad_filters(filters))

    def step_mel_jnp(x, jb, jf):
        out = melmod._log_mel_frames_batched(x, jb, jf)
        return x + jnp.mean(out).astype(x.dtype) * 1e-30

    us = _loop_time(step_mel_jnp, x0, (jb, jf), iters=200)
    emit("mel jnp (30s)", us, mel_flops / us, "GFLOPS", peak_flops)


def bench_sweep(models, batches, audio_seconds: float, out_csv) -> None:
    """Model x batch-size throughput sweep -> CSV — the analogue of the
    reference's ``extra/bench.py`` (model x thread x processor sweep,
    whisper.cpp README.md:742-752), re-aimed at the TPU serving axes."""
    import csv
    import sys as _sys
    import time as _time

    import numpy as np

    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.parallel.batch import BatchTranscriber

    sys.path.insert(0, "/root/repo")
    rows = []
    w = csv.writer(out_csv)
    w.writerow(["model", "batch", "audio_s", "wall_s", "audio_s_per_s"])
    for model in models:
        ctx = gwt.WhisperContext.synthetic(model, seed=0, on_device=True)
        tp = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                                  print_progress=False)
        rng = np.random.default_rng(0)

        def make(seed):
            t = np.arange(int(audio_seconds * 16000)) / 16000.0
            return (0.2 * np.sin(2 * np.pi * 220 * t)
                    + 0.01 * rng.standard_normal(len(t))
                    ).astype(np.float32)

        bt = BatchTranscriber(ctx)
        for nb in batches:
            clips = [make(i) for i in range(nb)]
            bt.transcribe(clips, tp)          # warm/compile
            t0 = _time.perf_counter()
            bt.transcribe(clips, tp)
            dt = _time.perf_counter() - t0
            total = nb * audio_seconds
            w.writerow([model, nb, total, round(dt, 3),
                        round(total / dt, 1)])
            out_csv.flush()
            print(f"{model} B={nb}: {total / dt:.1f} audio-s/s",
                  file=_sys.stderr)
        del ctx, bt


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gwt-bench")
    p.add_argument("--what",
                   choices=["encoder", "memcpy", "matmul", "e2e",
                            "kernels", "sweep"],
                   default="encoder")
    p.add_argument("-m", "--model", default="tiny.en")
    p.add_argument("-n", "--iterations", type=int, default=8)
    p.add_argument("--models", default="tiny.en,base.en,small.en",
                   help="sweep: comma list of model names")
    p.add_argument("--batches", default="1,8,16",
                   help="sweep: comma list of batch sizes")
    p.add_argument("--audio-seconds", type=float, default=60.0)
    p.add_argument("-o", "--output", default="-",
                   help="sweep: CSV path (default stdout)")
    args = p.parse_args(argv)

    from godot_whisper_tpu.runtime.cache import enable_compilation_cache
    from godot_whisper_tpu.runtime.logging import system_info
    enable_compilation_cache()
    print(system_info())

    if args.what == "memcpy":
        bench_memcpy()
    elif args.what == "matmul":
        bench_matmul()
    elif args.what == "kernels":
        bench_kernels()
    elif args.what == "sweep":
        models = [m for m in args.models.split(",") if m]
        batches = [int(b) for b in args.batches.split(",") if b]
        if args.output == "-":
            bench_sweep(models, batches, args.audio_seconds, sys.stdout)
        else:
            with open(args.output, "w", newline="") as f:
                bench_sweep(models, batches, args.audio_seconds, f)
    elif args.what == "e2e":
        import subprocess
        return subprocess.call([sys.executable, "bench.py"])
    else:
        bench_encoder(args.model, args.iterations)
    return 0


if __name__ == "__main__":
    sys.exit(main())
