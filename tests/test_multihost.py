"""Multi-host execution test: 2 processes x 4 virtual CPU devices.

The reference's scale-out is N threads in one process
(whisper_full_parallel, whisper.cpp:5817-5930); this framework's is N
PROCESSES joined by ``jax.distributed`` into one dp-sharded mesh
(parallel/dist.py).  The test spawns two real OS processes with gloo
collectives, each feeding 2 local clips, and asserts each host's local
segments match a single-process BatchTranscriber run over all 4 clips.
"""

import json
import os
import subprocess
import sys

import pytest

import godot_whisper_tpu as gwt
from godot_whisper_tpu.parallel.batch import BatchTranscriber

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def test_two_process_batch_matches_single(tmp_path):
    sys.path.insert(0, HERE)
    try:
        from multihost_worker import CLIPS_PER_PROC, build_nano, make_clip
    finally:
        sys.path.pop(0)

    nproc = 2
    port = 29600 + os.getpid() % 800
    outs = [str(tmp_path / f"p{i}.json") for i in range(nproc)]
    procs = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    repo = os.path.dirname(HERE)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    for i in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port),
             outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    # single-process reference over the SAME 4 clips (this pytest process
    # runs the standard 8-virtual-device conftest mesh; BatchTranscriber
    # on the default single device is the parity oracle)
    ctx = build_nano()
    clips = [make_clip(g) for g in range(nproc * CLIPS_PER_PROC)]
    ref = BatchTranscriber(ctx).transcribe(
        clips, gwt.TranscribeParams(best_of=1, temperature_inc=0.0))

    for i in range(nproc):
        with open(outs[i]) as f:
            local = json.load(f)
        assert len(local) == CLIPS_PER_PROC
        for j, segs in enumerate(local):
            g = i * CLIPS_PER_PROC + j
            got = "".join(s["text"] for s in segs)
            want = "".join(s.text for s in ref[g])
            assert got == want, (
                f"stream {g}: multihost {got!r} != single-process {want!r}")


@pytest.mark.parametrize("counts", [[3, 1], [3, 0]])
def test_two_process_ragged_counts(tmp_path, counts):
    """Edge cases of dist.py's padding machinery (dist.py:196-213):
    unequal per-process clip counts (dummy-row padding + seek_end=0
    never-active rows), a zero-clip process, and ragged local f_cap
    (clip lengths grow with the global index, so the processes disagree
    on the mel frame capacity before the allgather)."""
    sys.path.insert(0, HERE)
    try:
        from multihost_worker import build_nano, make_clip
    finally:
        sys.path.pop(0)

    nproc = 2
    port = 29600 + (os.getpid() + sum(counts) * 37) % 800
    outs = [str(tmp_path / f"p{i}.json") for i in range(nproc)]
    procs = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(HERE)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    spec = ",".join(str(c) for c in counts)
    for i in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port),
             outs[i], spec],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    ctx = build_nano()
    clips = [make_clip(g) for g in range(sum(counts))]
    ref = BatchTranscriber(ctx).transcribe(
        clips, gwt.TranscribeParams(best_of=1, temperature_inc=0.0))

    base = 0
    for i in range(nproc):
        with open(outs[i]) as f:
            local = json.load(f)
        assert len(local) == counts[i]
        for j, segs in enumerate(local):
            g = base + j
            got = "".join(s["text"] for s in segs)
            want = "".join(s.text for s in ref[g])
            assert got == want, (
                f"stream {g}: multihost {got!r} != single-process {want!r}")
        base += counts[i]
