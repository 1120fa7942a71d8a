"""ggml ``.bin`` checkpoint reader/writer.

File layout (mirrors ``whisper_model_load``,
/root/reference/thirdparty/whisper.cpp/whisper.cpp:1102-1640):

    uint32  magic = 0x67676d6c ("ggml")
    int32 x 11 hparams: n_vocab, n_audio_ctx, n_audio_state, n_audio_head,
                        n_audio_layer, n_text_ctx, n_text_state, n_text_head,
                        n_text_layer, n_mels, ftype
    int32 n_mel, int32 n_fft_bins, f32[n_mel*n_fft_bins] mel filterbank
    int32 n_vocab_file, then per token: uint32 len + raw bytes
    tensor records until EOF:
        int32 n_dims, int32 name_len, int32 ggml_type
        int32 ne[n_dims]          (ne[0] = fastest-varying dim)
        name bytes
        raw tensor data (row-major with ne[0] fastest)

A file with zero tensor records is a valid *stub* checkpoint ("assuming empty
model for testing", whisper.cpp:1627-1628) — the reference ships these as
``models/for-tests-ggml-*.bin`` and we generate our own via
``write_stub_checkpoint`` for CI.

This module is pure NumPy (host-side IO); conversion into device arrays with
the target dtype/sharding happens in ``params.py``.
"""

from __future__ import annotations

import dataclasses
import io
import struct
from typing import BinaryIO, Dict, List, Optional, Tuple, Union

import numpy as np

from .config import WhisperConfig, config_from_hparams

GGML_MAGIC = 0x67676D6C
QNT_VERSION_FACTOR = 1000

# ggml_type enum values (ggml.h:325-341)
GGML_TYPE_F32 = 0
GGML_TYPE_F16 = 1
GGML_TYPE_Q4_0 = 2
GGML_TYPE_Q4_1 = 3
GGML_TYPE_Q5_0 = 6
GGML_TYPE_Q5_1 = 7
GGML_TYPE_Q8_0 = 8

# ggml_ftype file-level hints (ggml.h): 0=f32, 1=f16, 2=q4_0, 3=q4_1,
# 8=q5_0, 9=q5_1, 7=q8_0.
FTYPE_TO_TYPE = {0: GGML_TYPE_F32, 1: GGML_TYPE_F16, 2: GGML_TYPE_Q4_0,
                 3: GGML_TYPE_Q4_1, 7: GGML_TYPE_Q8_0, 8: GGML_TYPE_Q5_0,
                 9: GGML_TYPE_Q5_1}

_QBLOCK = 32  # elements per quant block for all supported Q formats


@dataclasses.dataclass
class RawCheckpoint:
    """Host-side checkpoint contents before pytree conversion."""

    config: WhisperConfig
    ftype: int
    qnt_version: int
    mel_filters: np.ndarray          # (n_mel, n_fft_bins) float32
    vocab_tokens: List[bytes]
    tensors: Dict[str, np.ndarray]   # name -> float32 ndarray, numpy shape
                                     #   = reversed(ne)  (row-major)

    @property
    def n_loaded(self) -> int:
        return len(self.tensors)


def _read_i32(f: BinaryIO) -> int:
    return struct.unpack("<i", f.read(4))[0]


def _read_u32(f: BinaryIO) -> int:
    return struct.unpack("<I", f.read(4))[0]


# --------------------------------------------------------------------- dequant
def _dequant(ttype: int, raw: bytes, n_elements: int) -> np.ndarray:
    """Dequantize a ggml-quants tensor payload to float32.

    Block layouts per ggml-quants.h:10-47 (Q4_0/Q4_1/Q5_0/Q5_1/Q8_0, 32
    elements per block).
    """
    n_blocks = n_elements // _QBLOCK
    buf = np.frombuffer(raw, dtype=np.uint8)
    if ttype == GGML_TYPE_Q4_0:
        rec = buf.reshape(n_blocks, 18)
        d = rec[:, :2].copy().view(np.float16).astype(np.float32)  # (nb,1)
        qs = rec[:, 2:]
        lo = (qs & 0x0F).astype(np.int8)
        hi = (qs >> 4).astype(np.int8)
        q = np.concatenate([lo, hi], axis=1).astype(np.float32) - 8.0
        return (q * d).reshape(-1)
    if ttype == GGML_TYPE_Q4_1:
        rec = buf.reshape(n_blocks, 20)
        d = rec[:, :2].copy().view(np.float16).astype(np.float32)
        m = rec[:, 2:4].copy().view(np.float16).astype(np.float32)
        qs = rec[:, 4:]
        lo = (qs & 0x0F)
        hi = (qs >> 4)
        q = np.concatenate([lo, hi], axis=1).astype(np.float32)
        return (q * d + m).reshape(-1)
    if ttype == GGML_TYPE_Q5_0:
        rec = buf.reshape(n_blocks, 22)
        d = rec[:, :2].copy().view(np.float16).astype(np.float32)
        qh = rec[:, 2:6].copy().view(np.uint32).reshape(n_blocks, 1)
        qs = rec[:, 6:]
        shifts = np.arange(32, dtype=np.uint32)
        hbits = ((qh >> shifts) & 1).astype(np.uint8)  # (nb, 32)
        lo = (qs & 0x0F)
        hi = (qs >> 4)
        q = np.concatenate([lo, hi], axis=1)
        q = (q | (hbits << 4)).astype(np.float32) - 16.0
        return (q * d).reshape(-1)
    if ttype == GGML_TYPE_Q5_1:
        rec = buf.reshape(n_blocks, 24)
        d = rec[:, :2].copy().view(np.float16).astype(np.float32)
        m = rec[:, 2:4].copy().view(np.float16).astype(np.float32)
        qh = rec[:, 4:8].copy().view(np.uint32).reshape(n_blocks, 1)
        qs = rec[:, 8:]
        shifts = np.arange(32, dtype=np.uint32)
        hbits = ((qh >> shifts) & 1).astype(np.uint8)
        lo = (qs & 0x0F)
        hi = (qs >> 4)
        q = np.concatenate([lo, hi], axis=1)
        q = (q | (hbits << 4)).astype(np.float32)
        return (q * d + m).reshape(-1)
    if ttype == GGML_TYPE_Q8_0:
        rec = buf.reshape(n_blocks, 34)
        d = rec[:, :2].copy().view(np.float16).astype(np.float32)
        q = rec[:, 2:].copy().view(np.int8).astype(np.float32)
        return (q * d).reshape(-1)
    raise ValueError(f"unsupported ggml tensor type {ttype}")


def quantize_blocks(ttype: int, arr: np.ndarray) -> bytes:
    """Quantize a float32 array to ggml block format (encode side of
    _dequant; reference kernels in ggml-quants.c)."""
    flat = np.ascontiguousarray(arr, dtype=np.float32).reshape(-1)
    n = flat.size
    assert n % _QBLOCK == 0, "tensor size must be a multiple of 32"
    blocks = flat.reshape(-1, _QBLOCK)
    nb = blocks.shape[0]
    if ttype == GGML_TYPE_Q8_0:
        d = np.abs(blocks).max(axis=1, keepdims=True) / 127.0
        d_safe = np.where(d == 0, 1.0, d)
        q = np.clip(np.round(blocks / d_safe), -127, 127).astype(np.int8)
        out = np.empty((nb, 34), dtype=np.uint8)
        out[:, :2] = d.astype("<f2").view(np.uint8)
        out[:, 2:] = q.view(np.uint8)
        return out.tobytes()
    if ttype == GGML_TYPE_Q4_0:
        amax_idx = np.argmax(np.abs(blocks), axis=1)
        maxv = blocks[np.arange(nb), amax_idx]           # signed max-|x|
        d = maxv / -8.0
        d_safe = np.where(d == 0, 1.0, d)
        q = np.clip(np.round(blocks / d_safe[:, None]) + 8, 0, 15
                    ).astype(np.uint8)
        lo, hi = q[:, :16], q[:, 16:]
        out = np.empty((nb, 18), dtype=np.uint8)
        out[:, :2] = d.astype("<f2")[:, None].view(np.uint8)
        out[:, 2:] = lo | (hi << 4)
        return out.tobytes()
    if ttype == GGML_TYPE_Q4_1:
        mn = blocks.min(axis=1)
        mx = blocks.max(axis=1)
        d = (mx - mn) / 15.0
        d_safe = np.where(d == 0, 1.0, d)
        q = np.clip(np.round((blocks - mn[:, None]) / d_safe[:, None]),
                    0, 15).astype(np.uint8)
        lo, hi = q[:, :16], q[:, 16:]
        out = np.empty((nb, 20), dtype=np.uint8)
        out[:, :2] = d.astype("<f2")[:, None].view(np.uint8)
        out[:, 2:4] = mn.astype("<f2")[:, None].view(np.uint8)
        out[:, 4:] = lo | (hi << 4)
        return out.tobytes()
    raise ValueError(f"unsupported quantization target {ttype}")


def _type_nbytes(ttype: int, n_elements: int) -> int:
    if ttype == GGML_TYPE_F32:
        return 4 * n_elements
    if ttype == GGML_TYPE_F16:
        return 2 * n_elements
    per_block = {GGML_TYPE_Q4_0: 18, GGML_TYPE_Q4_1: 20, GGML_TYPE_Q5_0: 22,
                 GGML_TYPE_Q5_1: 24, GGML_TYPE_Q8_0: 34}[ttype]
    assert n_elements % _QBLOCK == 0
    return per_block * (n_elements // _QBLOCK)


# ------------------------------------------------------------------------ read
def read_checkpoint(path_or_file: Union[str, BinaryIO, bytes]) -> RawCheckpoint:
    """Read a ggml .bin checkpoint into host memory."""
    if isinstance(path_or_file, (bytes, bytearray)):
        f: BinaryIO = io.BytesIO(path_or_file)
        close = False
    elif isinstance(path_or_file, str):
        f = open(path_or_file, "rb")
        close = True
    else:
        f = path_or_file
        close = False

    try:
        magic = _read_u32(f)
        if magic != GGML_MAGIC:
            raise ValueError(f"bad magic 0x{magic:08x} (expected ggml)")

        hp = [_read_i32(f) for _ in range(11)]
        ftype = hp[10]
        qnt_version = ftype // QNT_VERSION_FACTOR
        ftype %= QNT_VERSION_FACTOR
        config = config_from_hparams(*hp[:10])

        n_mel = _read_i32(f)
        n_fft_bins = _read_i32(f)
        filt = np.frombuffer(
            f.read(4 * n_mel * n_fft_bins), dtype="<f4"
        ).reshape(n_mel, n_fft_bins).copy()

        n_vocab_file = _read_i32(f)
        vocab: List[bytes] = []
        for _ in range(n_vocab_file):
            ln = _read_u32(f)
            vocab.append(f.read(ln) if ln else b"")

        tensors: Dict[str, np.ndarray] = {}
        while True:
            header = f.read(12)
            if len(header) < 12:
                break
            n_dims, name_len, ttype = struct.unpack("<iii", header)
            ne = [1, 1, 1, 1]
            n_elements = 1
            for i in range(n_dims):
                ne[i] = _read_i32(f)
                n_elements *= ne[i]
            name = f.read(name_len).decode("utf-8")
            nbytes = _type_nbytes(ttype, n_elements)
            raw = f.read(nbytes)
            if len(raw) < nbytes:
                raise ValueError(f"truncated tensor {name!r}")
            if ttype == GGML_TYPE_F32:
                flat = np.frombuffer(raw, dtype="<f4").astype(np.float32)
            elif ttype == GGML_TYPE_F16:
                flat = np.frombuffer(raw, dtype="<f2").astype(np.float32)
            else:
                flat = _dequant(ttype, raw, n_elements)
            # numpy shape = reversed(ne): ne[0] is the fastest dim.
            shape = tuple(reversed(ne[:max(1, n_dims)]))
            tensors[name] = flat.reshape(shape)

        return RawCheckpoint(
            config=config, ftype=ftype, qnt_version=qnt_version,
            mel_filters=filt, vocab_tokens=vocab, tensors=tensors)
    finally:
        if close:
            f.close()


# ----------------------------------------------------------------------- write
def write_checkpoint(
    path: str,
    config: WhisperConfig,
    mel_filters: np.ndarray,
    vocab_tokens: List[bytes],
    tensors: Optional[Dict[str, Tuple[np.ndarray, int]]] = None,
    *,
    ftype: int = 1,
    qnt_version: int = 2,
) -> None:
    """Write a ggml .bin checkpoint.

    ``tensors`` maps name -> (float32 ndarray with numpy shape = reversed(ne),
    ggml type id).  With ``tensors=None`` a weightless stub checkpoint is
    produced (the CI test-model trick, whisper.cpp:1627-1628).
    """
    with open(path, "wb") as f:
        f.write(struct.pack("<I", GGML_MAGIC))
        c = config
        for v in (c.n_vocab, c.n_audio_ctx, c.n_audio_state, c.n_audio_head,
                  c.n_audio_layer, c.n_text_ctx, c.n_text_state,
                  c.n_text_head, c.n_text_layer, c.n_mels,
                  qnt_version * QNT_VERSION_FACTOR + ftype):
            f.write(struct.pack("<i", v))

        n_mel, n_fft_bins = mel_filters.shape
        f.write(struct.pack("<ii", n_mel, n_fft_bins))
        f.write(np.ascontiguousarray(mel_filters, dtype="<f4").tobytes())

        f.write(struct.pack("<i", len(vocab_tokens)))
        for tok in vocab_tokens:
            f.write(struct.pack("<I", len(tok)))
            f.write(tok)

        if tensors:
            for name, (arr, ttype) in tensors.items():
                ne = list(reversed(arr.shape))
                name_b = name.encode("utf-8")
                f.write(struct.pack("<iii", len(ne), len(name_b), ttype))
                for d in ne:
                    f.write(struct.pack("<i", d))
                f.write(name_b)
                if ttype == GGML_TYPE_F32:
                    f.write(np.ascontiguousarray(arr, dtype="<f4").tobytes())
                elif ttype == GGML_TYPE_F16:
                    f.write(np.ascontiguousarray(arr, dtype="<f2").tobytes())
                else:
                    f.write(quantize_blocks(ttype, arr))


def write_stub_checkpoint(path: str, config: WhisperConfig,
                          mel_filters: np.ndarray,
                          vocab_tokens: List[bytes]) -> None:
    """Weightless stub checkpoint for tests (mirrors for-tests-ggml-*.bin)."""
    write_checkpoint(path, config, mel_filters, vocab_tokens, tensors=None,
                     ftype=1)
