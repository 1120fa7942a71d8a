"""Bulk batch transcription — BASELINE config 5's shape: N concurrent
utterance streams data-parallel on the chip/mesh.

    python -m godot_whisper_tpu.cli.batch -m model.bin wavs/ -o out/ \
        --batch-size 8 --output-format srt

Clips are grouped into batches and driven in lockstep through
parallel/batch.py (one batched encode + one batched in-jit decode per
window round).  On a multi-chip mesh, shard the params first (see
docs/SCALING.md) — the stream axis then splits over "dp" automatically.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gwt-batch")
    p.add_argument("input_dir", help="directory of .wav files")
    p.add_argument("-m", "--model", default=None)
    p.add_argument("--synthetic", default=None, metavar="NAME")
    p.add_argument("-o", "--out-dir", default=None)
    p.add_argument("-b", "--batch-size", type=int, default=8)
    p.add_argument("-l", "--language", default="en")
    p.add_argument("--output-format", default="txt",
                   choices=["txt", "srt", "vtt", "json", "csv", "lrc"])
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host: coordinator address (or set "
                        "GWT_COORDINATOR); run the same command on every "
                        "host with GWT_PROCESS_ID/GWT_NUM_PROCESSES")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel width per host (multi-host mode)")
    args = p.parse_args(argv)

    from godot_whisper_tpu.parallel import dist
    multihost = bool(args.coordinator or os.environ.get("GWT_COORDINATOR"))
    if multihost:
        # must run before ANY jax computation
        dist.initialize(coordinator_address=args.coordinator,
                        num_processes=args.num_processes,
                        process_id=args.process_id)

    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.audio.resample import resample
    from godot_whisper_tpu.audio.wav import read_wav
    from godot_whisper_tpu.parallel.batch import BatchTranscriber
    from godot_whisper_tpu.runtime.cache import enable_compilation_cache
    from . import outputs
    enable_compilation_cache()

    if args.synthetic:
        ctx = gwt.WhisperContext.synthetic(args.synthetic)
    elif args.model:
        ctx = gwt.WhisperContext.from_file(args.model)
    else:
        print("error: need -m or --synthetic", file=sys.stderr)
        return 1

    wavs = sorted(glob.glob(os.path.join(args.input_dir, "*.wav")))
    if args.limit:
        wavs = wavs[:args.limit]
    if not wavs:
        print("no .wav files found", file=sys.stderr)
        return 1

    out_dir = args.out_dir or args.input_dir
    os.makedirs(out_dir, exist_ok=True)

    writers = {"txt": outputs.to_txt, "srt": outputs.to_srt,
               "vtt": outputs.to_vtt, "csv": outputs.to_csv,
               "lrc": outputs.to_lrc,
               "json": lambda s: outputs.to_json(
                   s, model_name=ctx.config.name, language=args.language)}
    write = writers[args.output_format]

    tparams = gwt.TranscribeParams(language=args.language,
                                   print_progress=False)
    if multihost:
        # each process takes an interleaved share of the file list; the
        # stream batch itself is one dp-sharded dispatch across hosts
        import jax
        bt = dist.MultiHostBatchTranscriber(ctx, dist.stream_mesh(args.tp))
        wavs = wavs[jax.process_index()::jax.process_count()]
    else:
        bt = BatchTranscriber(ctx)

    total_audio = 0.0
    t_start = time.perf_counter()
    n_rounds_local = len(wavs)
    if multihost:
        # every process MUST run the same number of transcribe() rounds —
        # each round is a collective (allgather + SPMD dispatch), so a
        # process with fewer local files iterating fewer rounds deadlocks
        # the others.  Agree on the max and run surplus rounds with an
        # empty local group (transcribe pads ragged counts internally).
        from godot_whisper_tpu.parallel.dist import _allgather_host
        import numpy as _np
        n_rounds_local = int(_allgather_host(
            _np.asarray([len(wavs)], _np.int32)).max())
    for i in range(0, n_rounds_local, args.batch_size):
        group = wavs[i:i + args.batch_size]
        clips = []
        for wav in group:
            samples, rate = read_wav(wav)
            if rate != gwt.SAMPLE_RATE:
                samples = resample(samples, rate, gwt.SAMPLE_RATE)
            clips.append(samples)
            total_audio += len(samples) / gwt.SAMPLE_RATE

        results = bt.transcribe(clips, tparams)
        for wav, segs in zip(group, results):
            base = os.path.splitext(os.path.basename(wav))[0]
            out_path = os.path.join(out_dir,
                                    base + "." + args.output_format)
            with open(out_path, "w") as f:
                f.write(write(segs))
        print(f"[{min(i + args.batch_size, len(wavs))}/{len(wavs)}] done",
              file=sys.stderr)

    dt = time.perf_counter() - t_start
    print(f"{len(wavs)} files, {total_audio:.1f}s audio in {dt:.1f}s "
          f"({total_audio / dt:.1f} audio-s/s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
