"""Audio-chunk data parallelism — equivalent of ``whisper_full_parallel``
(/root/reference/thirdparty/whisper.cpp/whisper.cpp:5817-5930).

The reference spawns one host thread + one whisper_state per contiguous
audio chunk.  On TPU the same shape is expressed as sequential window
decodes against a single resident weight set (chunk boundaries keep the
reference's semantics: timestamps offset by the chunk start, a trailing
overlap warning applies equally).  True multi-stream throughput parallelism
lives in ``parallel/batch.py`` (batched utterance streams — the design the
reference cannot express), this module exists for API parity and for
single-stream latency splitting.
"""

from __future__ import annotations

import copy
from typing import List

import numpy as np

from ..models.config import SAMPLE_RATE
from ..decode.params import TranscribeParams


def full_parallel(pipeline, tparams: TranscribeParams,
                  samples: np.ndarray, n_processors: int) -> List:
    """Split samples into n contiguous chunks, transcribe each, merge
    segments with timestamp offsets (whisper.cpp:5877-5919)."""
    if n_processors <= 1:
        return pipeline.full(tparams, samples)

    n = len(samples)
    offset_samples = (SAMPLE_RATE * tparams.offset_ms) // 1000
    n_samples_per_processor = (n - offset_samples) // n_processors

    # chunk 0 keeps the caller's offset; later chunks start fresh
    all_segments = []
    offset_t = 0

    params_cur = copy.copy(tparams)
    params_cur.offset_ms = tparams.offset_ms
    params_cur.print_progress = False

    for i in range(n_processors):
        start = offset_samples + i * n_samples_per_processor
        end = n if i == n_processors - 1 else (
            offset_samples + (i + 1) * n_samples_per_processor)
        p = copy.copy(params_cur)
        if i > 0:
            p.offset_ms = 0
        chunk = samples[start:end]

        segs = pipeline.full(p, chunk)
        offset_t = (100 * start) // SAMPLE_RATE
        for s in segs:
            s2 = copy.deepcopy(s)
            s2.t0 += offset_t
            s2.t1 += offset_t
            all_segments.append(s2)

    pipeline.segments = all_segments
    return all_segments
