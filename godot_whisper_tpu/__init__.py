"""godot_whisper_tpu — a TPU-native streaming speech-to-text framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
V-Sekai/godot-whisper (whisper.cpp v1.5.1 inside a Godot GDExtension):
16 kHz resampling, log-mel STFT, the Whisper encoder/decoder family
(tiny → large-v3), greedy/beam decode with timestamps and prompt
conditioning, realtime chunked streaming with VAD, and multi-chip scaling
via ``jax.sharding``.

Public API mirrors the whisper.h C surface
(/root/reference/thirdparty/whisper.cpp/whisper.h:150-606) where that
surface is meaningful in Python; compute-path internals are deliberately
TPU-first rather than ports.

Quick start::

    import godot_whisper_tpu as gwt
    ctx = gwt.WhisperContext.from_file("ggml-tiny.en.bin")
    segments = ctx.full(gwt.TranscribeParams(), samples)
    print(ctx.text())
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .models.config import (CONFIGS, MAX_DECODERS, WhisperConfig, get_config,
                            SAMPLE_RATE, N_FFT, HOP_LENGTH, CHUNK_SECONDS)
from .models import loader_ggml
from .models.params import init_params, params_from_raw
from .audio.tokenizer import Tokenizer, synthetic_vocab
from .audio.mel import mel_filterbank
from .decode.language import lang_id, lang_max_id, lang_str, lang_str_full
from .decode.loop import Segment, TokenData, WhisperPipeline
from .decode.params import (SamplingStrategy, TranscribeParams, beam_params,
                            greedy_params)

__version__ = "0.1.0"

__all__ = [
    "WhisperContext", "WhisperConfig", "TranscribeParams",
    "SamplingStrategy", "Segment", "TokenData", "get_config",
    "greedy_params", "beam_params", "lang_id", "lang_str", "lang_str_full",
    "lang_max_id", "SAMPLE_RATE", "MAX_DECODERS",
]


class WhisperContext:
    """A loaded model + decode state.

    Equivalent of ``whisper_context`` + its default ``whisper_state``
    (whisper_init_from_file_with_params, whisper.h:150-170).
    """

    def __init__(self, pipeline: WhisperPipeline):
        self._p = pipeline

    # ------------------------------------------------------------ constructors
    @classmethod
    def from_file(cls, path: str, *, compute_dtype=None,
                  quantize: Optional[str] = None) -> "WhisperContext":
        """Load a ggml .bin checkpoint (whisper_init_from_file).

        ``quantize="int8"`` stores the decoder weights int8 with in-kernel
        dequant (models/quant.py) — half the decode-time HBM traffic.
        """
        raw = loader_ggml.read_checkpoint(path)
        return cls._from_raw(raw, compute_dtype, quantize)

    @classmethod
    def from_buffer(cls, buf: bytes, *, compute_dtype=None,
                    quantize: Optional[str] = None) -> "WhisperContext":
        """Load from an in-memory ggml model (whisper_init_from_buffer) —
        the path godot-whisper uses for Godot resources
        (src/speech_to_text.cpp:345)."""
        raw = loader_ggml.read_checkpoint(buf)
        return cls._from_raw(raw, compute_dtype, quantize)

    @staticmethod
    def _quantize(params, quantize: Optional[str]):
        if quantize in (None, "", "none"):
            return params
        if quantize in ("int8", "q8", "q8_0"):
            from .models.quant import quantize_decoder_int8
            return quantize_decoder_int8(params)
        if quantize in ("int4", "q4", "q4_0"):
            from .models.quant import quantize_decoder_int4
            return quantize_decoder_int4(params)
        if quantize in ("int8_embed", "q8_embed"):
            from .models.quant import quantize_embed_int8
            return quantize_embed_int8(params)
        raise ValueError(f"unknown quantize mode {quantize!r} "
                         "(supported: 'int8', 'int4', 'int8_embed')")

    @classmethod
    def _from_raw(cls, raw, compute_dtype=None,
                  quantize: Optional[str] = None) -> "WhisperContext":
        import time
        import jax.numpy as jnp
        t0 = time.perf_counter()
        dtype = compute_dtype or jnp.bfloat16
        params = cls._quantize(params_from_raw(raw, compute_dtype=dtype),
                               quantize)
        tokenizer = Tokenizer(raw.config, raw.vocab_tokens)
        pipe = WhisperPipeline(raw.config, params, tokenizer,
                               raw.mel_filters, n_loaded=raw.n_loaded)
        pipe.timings.t_load_us = int((time.perf_counter() - t0) * 1e6)
        return cls(pipe)

    @classmethod
    def from_hf(cls, path: str, *, compute_dtype=None,
                quantize: Optional[str] = None) -> "WhisperContext":
        """Load a local HuggingFace Whisper snapshot directory."""
        import jax.numpy as jnp
        from .models.loader_hf import load_hf_checkpoint
        dtype = compute_dtype or jnp.bfloat16
        config, params = load_hf_checkpoint(path, compute_dtype=dtype)
        params = cls._quantize(params, quantize)
        tokenizer = Tokenizer(config, synthetic_vocab(config))
        pipe = WhisperPipeline(config, params, tokenizer,
                               mel_filterbank(config.n_mels), n_loaded=1)
        return cls(pipe)

    @classmethod
    def synthetic(cls, name: str = "tiny.en", *, seed: int = 0,
                  compute_dtype=None,
                  quantize: Optional[str] = None,
                  on_device: bool = False) -> "WhisperContext":
        """Random-weight model for benches/tests (no checkpoint needed).

        ``on_device=True`` generates the weights on the accelerator (no
        host->device weight upload — benching multi-GB models over a
        slow relay link)."""
        import jax.numpy as jnp
        config = get_config(name)
        dtype = compute_dtype or jnp.bfloat16
        if on_device:
            from .models.params import init_params_device
            params = init_params_device(config, seed=seed,
                                        compute_dtype=dtype)
        else:
            params = init_params(config, seed=seed, compute_dtype=dtype)
        params = cls._quantize(params, quantize)
        tokenizer = Tokenizer(config, synthetic_vocab(config))
        pipe = WhisperPipeline(config, params, tokenizer,
                               mel_filterbank(config.n_mels), n_loaded=1)
        return cls(pipe)

    # ----------------------------------------------------------------- basics
    @property
    def config(self) -> WhisperConfig:
        return self._p.config

    @property
    def pipeline(self) -> WhisperPipeline:
        return self._p

    @property
    def tokenizer(self) -> Tokenizer:
        return self._p.tokenizer

    def is_multilingual(self) -> bool:
        return self._p.config.is_multilingual

    # ------------------------------------------------------------ transcription
    def full(self, params: Optional[TranscribeParams],
             samples: np.ndarray) -> List[Segment]:
        """Run the full pipeline: mel + detect + decode + segment
        (whisper_full, whisper.h:564-570)."""
        return self._p.full(params or TranscribeParams(), samples)

    def full_parallel(self, params: Optional[TranscribeParams],
                      samples: np.ndarray, n_processors: int) -> List[Segment]:
        """Chunked data-parallel transcription (whisper_full_parallel,
        whisper.cpp:5817-5930)."""
        from .parallel.chunked import full_parallel
        return full_parallel(self._p, params or TranscribeParams(), samples,
                             n_processors)

    # ------------------------------------------------------------ result access
    def full_n_segments(self) -> int:
        return len(self._p.segments)

    def full_get_segment(self, i: int) -> Segment:
        return self._p.segments[i]

    def full_get_segment_text(self, i: int) -> str:
        return self._p.segments[i].text

    def full_get_segment_t0(self, i: int) -> int:
        return self._p.segments[i].t0

    def full_get_segment_t1(self, i: int) -> int:
        return self._p.segments[i].t1

    def full_n_tokens(self, i: int) -> int:
        return len(self._p.segments[i].tokens)

    def full_get_token_data(self, i: int, j: int) -> TokenData:
        return self._p.segments[i].tokens[j]

    def full_get_token_text(self, i: int, j: int) -> str:
        return self._p.tokenizer.token_str(self._p.segments[i].tokens[j].id)

    def text(self) -> str:
        """Concatenated transcript of all segments."""
        return "".join(s.text for s in self._p.segments)

    def full_lang_id(self) -> Optional[int]:
        return self._p.lang_id_detected

    # ----------------------------------------------------------------- stages
    def pcm_to_mel(self, samples: np.ndarray) -> np.ndarray:
        self._p.set_audio(samples)
        return self._p.mel_host()

    def set_mel(self, mel: np.ndarray) -> None:
        self._p.set_mel(mel)

    def encode(self, seek: int = 0, audio_ctx: int = 0):
        """Stage-level encode (whisper_encode)."""
        enc, _ = self._p.encode_window(seek, audio_ctx)
        return enc

    def lang_auto_detect(self, seek: int = 0):
        """(lang_id, probs) over the language set (whisper_lang_auto_detect)."""
        return self._p.detect_language(seek)

    def decode(self, tokens: Sequence[int], n_past: int = 0,
               seek: int = 0) -> np.ndarray:
        """Stage-level decode (whisper_decode, whisper.h:286-297): run the
        decoder over ``tokens`` against the encoder output at ``seek`` and
        return the logits of the last token.  Requires audio/mel set.

        The KV cache persists across calls like the reference's
        whisper_state: ``decode(a, 0)`` then ``decode(b, len(a))``
        equals ``decode(a+b, 0)``.  ``n_past=0`` resets the cache; a
        call whose ``n_past`` does not line up with the cached history
        raises (the reference would silently attend stale cells)."""
        import jax.numpy as jnp
        from .models.model import (decoder_dense, init_kv_cache,
                                   param_compute_dtype)

        _, xkv = self._p.encode_window(seek)
        config = self._p.config
        toks = list(tokens)
        T = len(toks)
        cached = getattr(self, "_decode_state", None)
        if n_past == 0 or cached is None:
            kv = init_kv_cache(config, 1,
                               dtype=param_compute_dtype(self._p.params))
            if n_past != 0:
                raise ValueError(
                    f"decode(n_past={n_past}) with no cached history — "
                    "start a sequence with n_past=0")
        else:
            kv, cached_past = cached
            if cached_past != n_past:
                raise ValueError(
                    f"decode(n_past={n_past}) does not continue the "
                    f"cached history of {cached_past} tokens")
        arr = jnp.asarray([toks], dtype=jnp.int32)
        positions = jnp.broadcast_to(
            jnp.arange(n_past, n_past + T, dtype=jnp.int32), (1, T))
        logits, kv = decoder_dense(self._p.params, config, arr, positions,
                                   kv, xkv, n_valid=T, start=n_past)
        self._decode_state = (kv, n_past + T)
        return np.asarray(logits[0, -1])

    # ---------------------------------------------------------------- tokenize
    def tokenize(self, text: str) -> List[int]:
        return self._p.tokenizer.encode(text)

    def token_to_str(self, tid: int) -> str:
        return self._p.tokenizer.token_str(tid)

    # ----------------------------------------------------------------- timing
    def print_timings(self) -> None:
        print(self._p.timings.report())

    def reset_timings(self) -> None:
        self._p.timings.reset()

    @property
    def timings(self):
        return self._p.timings
