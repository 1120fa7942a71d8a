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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gwt-bench")
    p.add_argument("--what", choices=["encoder", "memcpy", "matmul", "e2e"],
                   default="encoder")
    p.add_argument("-m", "--model", default="tiny.en")
    p.add_argument("-n", "--iterations", type=int, default=8)
    args = p.parse_args(argv)

    from godot_whisper_tpu.runtime.cache import enable_compilation_cache
    from godot_whisper_tpu.runtime.logging import system_info
    enable_compilation_cache()
    print(system_info())

    if args.what == "memcpy":
        bench_memcpy()
    elif args.what == "matmul":
        bench_matmul()
    elif args.what == "e2e":
        import subprocess
        return subprocess.call([sys.executable, "bench.py"])
    else:
        bench_encoder(args.model, args.iterations)
    return 0


if __name__ == "__main__":
    sys.exit(main())
