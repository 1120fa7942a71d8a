"""Audio-chunk data parallelism — equivalent of ``whisper_full_parallel``
(/root/reference/thirdparty/whisper.cpp/whisper.cpp:5817-5930).

The reference spawns one host thread + one whisper_state per contiguous
audio chunk.  The TPU-native equivalent is BATCHED chunks: eligible
transcriptions — greedy AND beam/best_of (each chunk gets its own
in-device decoder pool) — stack the chunks on the batch axis and decode
them concurrently in the device-resident clip loop (parallel/batch.py) —
one dispatch drives every chunk's seek loop at once, the chip-side
analogue of the reference's thread-per-chunk.  Host-interactive decode
modes (grammar, user callbacks, language auto-detect) fall back to
sequential chunk decodes with identical merge semantics.

Chunk boundaries keep the reference's behavior: timestamps offset by the
chunk start (whisper.cpp:5877-5896) and the same boundary-quality caveat
applies (:5927).  True multi-stream throughput parallelism (independent
utterances, no boundary loss) lives in ``parallel/batch.py``.
"""

from __future__ import annotations

import copy
from types import SimpleNamespace
from typing import List

import numpy as np

from ..models.config import SAMPLE_RATE
from ..decode.params import TranscribeParams


def full_parallel(pipeline, tparams: TranscribeParams,
                  samples: np.ndarray, n_processors: int) -> List:
    """Split samples into n contiguous chunks, transcribe them
    CONCURRENTLY (batched on the chip) when the decode mode allows, merge
    segments with timestamp offsets (whisper.cpp:5877-5919)."""
    if n_processors <= 1:
        return pipeline.full(tparams, samples)

    n = len(samples)
    offset_samples = (SAMPLE_RATE * tparams.offset_ms) // 1000
    per = (n - offset_samples) // n_processors

    starts = [offset_samples + i * per for i in range(n_processors)]
    ends = [n if i == n_processors - 1 else starts[i] + per
            for i in range(n_processors)]
    chunks = [np.asarray(samples[s:e]) for s, e in zip(starts, ends)]

    p = copy.copy(tparams)
    p.offset_ms = 0        # chunk slicing already applied the offset
    # duration_ms rides into each chunk's decode unchanged — the reference
    # copies params wholesale per worker (whisper.cpp:5845-5853), so a
    # caller-set duration limits every chunk's decode window
    p.print_progress = False

    from .batch import BatchTranscriber
    bt = BatchTranscriber(SimpleNamespace(pipeline=pipeline,
                                          config=pipeline.config))
    # eligible (greedy) modes run as ONE batched dispatch decoding every
    # chunk's window loop at once; host-interactive modes fall back to
    # sequential per-chunk decodes inside BatchTranscriber
    results = bt.transcribe(chunks, p)

    all_segments = []
    for i, segs in enumerate(results):
        offset_t = (100 * starts[i]) // SAMPLE_RATE
        for s in segs:
            s2 = copy.deepcopy(s)
            s2.t0 += offset_t
            s2.t1 += offset_t
            all_segments.append(s2)

    pipeline.segments = all_segments
    return all_segments
