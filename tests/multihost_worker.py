"""Subprocess worker for tests/test_multihost.py.

One process of a 2-process x 4-virtual-CPU-device multi-host run
(gloo collectives).  Invoked as:

    python multihost_worker.py <pid> <nproc> <port> <out.json> [counts]

``counts`` (optional, comma list, default "2,2"): per-process clip
counts — unequal/zero counts exercise dist.py's padding + ragged-f_cap
allgather paths.

Builds the deterministic nano model + clips (shared with the test via
build_nano / make_clip), transcribes this process's local clips through
``MultiHostBatchTranscriber``, and dumps segments as JSON.
"""

import json
import os
import sys

CLIPS_PER_PROC = 2


def build_nano():
    """Deterministic nano context (must match test_multihost's single-
    process reference bit for bit)."""
    import jax.numpy as jnp
    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    return gwt.WhisperContext(pipe)


def make_clip(global_idx: int):
    import numpy as np
    rng = np.random.default_rng(100 + global_idx)
    seconds = 2.0 + 0.5 * global_idx
    freq = 220.0 * (1 + global_idx)
    t = np.arange(int(seconds * 16000)) / 16000.0
    return (0.3 * np.sin(2 * np.pi * freq * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


def main() -> None:
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    counts = ([int(x) for x in sys.argv[5].split(",")]
              if len(sys.argv) > 5 else [CLIPS_PER_PROC] * nproc)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from godot_whisper_tpu.parallel import dist
    dist.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=nproc, process_id=pid)
    assert jax.device_count() == 4 * nproc
    assert jax.process_count() == nproc

    import godot_whisper_tpu as gwt
    ctx = build_nano()
    base = sum(counts[:pid])
    clips = [make_clip(base + i) for i in range(counts[pid])]
    mesh = dist.stream_mesh(tp=1)
    mht = dist.MultiHostBatchTranscriber(ctx, mesh)
    segs = mht.transcribe(
        clips, gwt.TranscribeParams(best_of=1, temperature_inc=0.0))
    with open(out_path, "w") as f:
        json.dump([[{"t0": s.t0, "t1": s.t1, "text": s.text} for s in ss]
                   for ss in segs], f)


if __name__ == "__main__":
    main()
