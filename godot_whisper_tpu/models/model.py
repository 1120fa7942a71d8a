"""Whisper forward passes: conv stem + encoder, cross-KV precompute, decoder.

Behavioral contract mirrors the reference graphs:
- conv stem: 2x conv1d(k=3, pad=1) + GELU, second stride 2
  (/root/reference/thirdparty/whisper.cpp/whisper.cpp:1712-1723);
- encoder: pre-LN blocks, K projection has no bias, 4x GELU MLP, final
  ln_post; positional embedding sliced to the (possibly reduced) audio_ctx
  (whisper.cpp:1756-2003);
- cross-KV precompute amortizes K/V projections of the encoder output over
  all decode steps (whisper.cpp:2005-2074);
- decoder: token+pos embedding, causal self-attn over a KV cache, cross-attn
  without mask, logits = x @ token_embed^T (whisper.cpp:2148-2505).

TPU-first design choices (deliberately NOT the reference's):
- layers run under ``lax.scan`` over stacked weights (flat compile time);
- the KV cache is a fixed-shape functional array in MERGED-HEAD layout
  ``(layers, batch, cache_len, n_state)`` — exactly what the K/V
  projections produce, so no head-split transpose exists anywhere on the
  decode path (a head-major cache measured a full-cache layout copy per
  step; a per-row scatter write measured superlinear batch scaling);
- every KV write is a ``dynamic_update_slice`` at a batch-UNIFORM slot:
  prompts land at slots [0, P), autoregressive token i at slot
  ``split + i`` where ``split`` is the static prompt capacity — per-row
  prompt lengths are handled by masking the [n_prompt, split) gap, not
  by per-row write offsets (which would be a scatter);
- the per-token hot path is the fused Pallas kernel
  ``ops.decode_attention`` (segment-matmul head reduction, online
  softmax, live-prefix block skipping); beam reorder is a gather on the
  batch axis, replacing the reference's cell/seq-id mutation machinery
  (whisper.cpp:639-1054);
- masks are two scalar compares per slot, never materialized per
  sequence;
- all matmuls run in bfloat16 with float32 accumulation; LayerNorm and
  softmax run in float32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .config import WhisperConfig
from ..ops.qmatmul import (QuantTensor, Quant4Tensor, quant_matmul,
                           quant_matmul4)

Params = Dict[str, Any]

_NEG_INF = np.float32(-1e30)  # np: a module-level jnp constant initializes the backend at import, breaking jax.distributed.initialize


def param_compute_dtype(params: Params):
    """Matmul compute dtype of a param pytree (bf16 when the decoder is
    int8-quantized — the MXU contracts in bf16 after in-VMEM dequant)."""
    te = params["decoder"]["token_embed"]
    return jnp.bfloat16 if isinstance(te, QuantTensor) else te.dtype


def layer_norm(x: jax.Array, g: jax.Array, b: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """Float32 LayerNorm regardless of input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return y * g + b


def _heads(x: jax.Array, n_head: int) -> jax.Array:
    """(..., T, S) -> (..., T, H, Dh)."""
    return x.reshape(*x.shape[:-1], n_head, x.shape[-1] // n_head)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(..., T, H, Dh) -> (..., T, S)."""
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])


def mha(q: jax.Array, k: jax.Array, v: jax.Array,
        mask: Optional[jax.Array] = None) -> jax.Array:
    """Multi-head attention for the DENSE (multi-query) decoder passes.

    q: (B, Tq, H, Dh); k/v: (B, Tk, H, Dh) — seq-major, reshaped views of
    the merged-head caches (no transpose copies; XLA contracts the einsum
    in place).  mask broadcastable to (B, H, Tq, Tk) — additive, float32.
    Returns (B, Tq, H, Dh).  Softmax in float32; the 1/sqrt(Dh) scale is
    applied here (the reference splits it across pre-scaled Q and K,
    whisper.cpp:1835-1845 — numerically equivalent).  The single-token
    hot path uses ops/decode_attention.py instead.
    """
    dh = q.shape[-1]
    scale = jnp.float32(1.0 / (dh ** 0.5))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out


def _self_qkv(h: jax.Array, attn) -> Tuple[jax.Array, jax.Array,
                                           jax.Array]:
    """Self-attention q/k/v projections.  Quantized decoders carry ONE
    fused (S, 3S) weight (models/quant._fuse_self_qkv) — a single
    kernel dispatch instead of three, bit-identical math (per-output-
    channel scales; K's zero bias added explicitly)."""
    if "wqkv" in attn:
        y = _proj(h, attn["wqkv"], attn["bqkv"])
        s = y.shape[-1] // 3
        return y[..., :s], y[..., s:2 * s], y[..., 2 * s:]
    return (_proj(h, attn["wq"], attn["bq"]),
            _proj(h, attn["wk"]),
            _proj(h, attn["wv"], attn["bv"]))


def _proj(x: jax.Array, w, b: Optional[jax.Array] = None,
          out_dtype=None) -> jax.Array:
    if isinstance(w, (QuantTensor, Quant4Tensor)):
        # int8/int4 weight path: HBM reads shrink 2x/4x, dequant happens
        # in VMEM inside the Pallas kernels (ops/qmatmul.py)
        y = (quant_matmul(x, w, layout="io") if isinstance(w, QuantTensor)
             else quant_matmul4(x, w))
        if b is not None:
            y = y + b
        return y.astype(out_dtype if out_dtype is not None
                        else jnp.bfloat16)
    y = jnp.einsum("...i,io->...o", x, w,
                   preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(out_dtype if out_dtype is not None else w.dtype)


# ================================================================== encoder ==
def encoder_forward(params: Params, config: WhisperConfig,
                    mel_window: jax.Array,
                    audio_ctx: Optional[int] = None) -> jax.Array:
    """Conv stem + transformer encoder.

    mel_window: (B, 2*audio_ctx, n_mels) float32 — the mel slice
    [offset, offset + 2*n_ctx) as copied at whisper.cpp:1697-1706.
    Returns (B, audio_ctx, n_state) in compute dtype.
    """
    enc = params["encoder"]
    n_ctx = audio_ctx or config.n_audio_ctx
    n_head = config.n_audio_head
    cdtype = enc["conv1"]["w"].dtype

    # Conv stem in compute dtype (the MXU accumulates bf16 convs in f32;
    # preferred_element_type is avoided because its transpose rule breaks
    # mixed-dtype gradients).  Bias + GELU in f32.
    x = mel_window.astype(cdtype)
    dn = ("NWC", "WIO", "NWC")
    x = lax.conv_general_dilated(x, enc["conv1"]["w"], (1,), [(1, 1)],
                                 dimension_numbers=dn)
    x = jax.nn.gelu(x.astype(jnp.float32) + enc["conv1"]["b"],
                    approximate=False)
    x = x.astype(cdtype)
    x = lax.conv_general_dilated(x, enc["conv2"]["w"], (2,), [(1, 1)],
                                 dimension_numbers=dn)
    x = jax.nn.gelu(x.astype(jnp.float32) + enc["conv2"]["b"],
                    approximate=False)

    # Positional embedding: first n_ctx rows (reduced-audio_ctx view,
    # whisper.cpp:1801-1807).
    x = x + enc["pos_embed"][:n_ctx]
    x = x.astype(cdtype)

    blocks = enc["blocks"]

    from ..ops.attention import (_FLASH_MIN_BH, _enc_attn_mode,
                                 flash_attention, flash_attention_bh,
                                 use_pallas)

    b_sz = x.shape[0]
    mode = _enc_attn_mode()
    # head-major path: the q/k/v projections write (B, H, T, D) directly
    # (the head transpose folds INTO the projection einsums, and the
    # out-proj folds it back) so the flash kernel sees its (BH, T, D)
    # layout for free — an explicit transpose around the kernel measured
    # as expensive as the kernel itself (r5 on-chip A/B: bare kernel
    # 1034 us vs 2313 us through the transposing wrapper at large-v3 b8)
    head_major = use_pallas() and (
        mode == "flash" or (mode != "einsum"
                            and b_sz * n_head >= _FLASH_MIN_BH))

    # PAD-NATIVE residual stream: the flash kernel needs T in 512-blocks;
    # padding q/k/v and slicing the output around EVERY layer's kernel
    # call costs ~4 full-activation HBM round trips per layer (measured
    # r5: 2332 us through the per-call-padding wrapper vs 1034 us bare
    # kernel at large-v3 b8).  Instead pad x ONCE after the positional
    # add and run every block at T_pad with key masking (t_valid); the
    # padded rows carry harmless garbage (row-local LN/MLP; their K
    # columns are masked) and are sliced off once at the end.  Only
    # engaged when the pad waste is small (1500 -> 1536 = 2.4%); reduced
    # streaming audio_ctx values that would pad badly keep the per-call
    # wrapper path.
    t_real = n_ctx
    t_pad_enc = -(-n_ctx // 512) * 512
    pad_native = head_major and t_pad_enc != n_ctx \
        and (t_pad_enc - n_ctx) * 10 <= n_ctx
    if pad_native:
        x = jnp.pad(x, [(0, 0), (0, t_pad_enc - n_ctx), (0, 0)])

    def block_head_major(x, attn):
        h = x  # already layer-normed by caller
        c = h.shape[-1]
        d = c // n_head
        t = h.shape[1]
        q = (jnp.einsum("btc,chd->bhtd", h,
                        attn["wq"].reshape(c, n_head, d),
                        preferred_element_type=jnp.float32)
             + attn["bq"].reshape(n_head, 1, d)).astype(cdtype)
        k = jnp.einsum("btc,chd->bhtd", h,
                       attn["wk"].reshape(c, n_head, d),
                       preferred_element_type=jnp.float32).astype(cdtype)
        v = (jnp.einsum("btc,chd->bhtd", h,
                        attn["wv"].reshape(c, n_head, d),
                        preferred_element_type=jnp.float32)
             + attn["bv"].reshape(n_head, 1, d)).astype(cdtype)
        bh = b_sz * n_head
        o = flash_attention_bh(q.reshape(bh, t, d), k.reshape(bh, t, d),
                               v.reshape(bh, t, d),
                               t_valid=t_real if pad_native else None)
        o = o.reshape(b_sz, n_head, t, d).astype(cdtype)
        return (jnp.einsum("bhtd,hdo->bto", o,
                           attn["wo"].reshape(n_head, d, c),
                           preferred_element_type=jnp.float32)
                + attn["bo"]).astype(cdtype)

    def block(x, layer):
        ln0, attn, ln1, mlp = (layer["attn_ln"], layer["attn"],
                               layer["mlp_ln"], layer["mlp"])
        h = layer_norm(x, ln0["g"], ln0["b"]).astype(cdtype)
        if head_major:
            x = x + block_head_major(h, attn)
        else:
            q = _heads(_proj(h, attn["wq"], attn["bq"]), n_head)
            k = _heads(_proj(h, attn["wk"]), n_head)
            v = _heads(_proj(h, attn["wv"], attn["bv"]), n_head)
            # dense self-attention (Pallas flash kernel; einsum on CPU)
            o = _merge_heads(flash_attention(q, k, v)).astype(cdtype)
            x = x + _proj(o, attn["wo"], attn["bo"], out_dtype=cdtype)

        h = layer_norm(x, ln1["g"], ln1["b"]).astype(cdtype)
        h = jax.nn.gelu(_proj(h, mlp["w0"], mlp["b0"]), approximate=False)
        h = _proj(h.astype(cdtype), mlp["w1"], mlp["b1"], out_dtype=cdtype)
        return (x + h).astype(cdtype), None

    x, _ = lax.scan(lambda carry, layer: block(carry, layer), x, blocks)
    if pad_native:
        x = x[:, :t_real]
    x = layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"])
    return x.astype(cdtype)


# ================================================================= cross-KV ==
_BLOCK_C = 256  # cache-slot granularity of ops/decode_attention.py


def round_cache_len(n: int) -> int:
    """Round a cache capacity up to the decode-kernel block size."""
    return max(-(-n // _BLOCK_C) * _BLOCK_C, _BLOCK_C)


class CrossKV(NamedTuple):
    """Merged-head cross-attention KV: the raw projection outputs.

    k/v: (L, B, T_pad, S) with T_pad = audio positions rounded up to the
    decode-kernel block; t_valid: scalar i32 — positions >= t_valid are
    zero padding and masked out of every attention."""
    k: jax.Array
    v: jax.Array
    t_valid: jax.Array


class QuantCrossKV(NamedTuple):
    """Int8-quantized cross-attention KV (merged-head layout).

    large-v3 decode is HBM-bandwidth-bound and the cross KV is its largest
    per-step read (L*T*S * 2 tensors); int8 storage halves that.
    K keeps a per-(position, head) scale (factorable out of the score
    contraction); V uses a per-head scale (must factor out of the
    probs-weighted sum).  Opt-in via TranscribeParams.cross_kv_int8.
    """

    k_q: jax.Array   # (L, B, T_pad, S) int8
    k_s: jax.Array   # (L, B, T_pad, HP) bf16 — head axis padded to the
                     # kernel's 128-lane tile (zeros beyond n_head)
    v_q: jax.Array   # (L, B, T_pad, S) int8
    v_s: jax.Array   # (L, B, HP) f32 — padded likewise
    t_valid: jax.Array  # scalar i32


_H_PAD = 128  # must match ops/decode_attention._H_PAD


def quantize_cross_kv(xkv: CrossKV,
                      n_head: Optional[int] = None) -> QuantCrossKV:
    l, b, t, s = xkv.k.shape
    # head count from the state width (head_dim is 64 for every published
    # Whisper size; synthetic configs pass n_head explicitly)
    n_head = n_head if n_head is not None else s // 64
    d = s // n_head
    kf = xkv.k.astype(jnp.float32).reshape(l, b, t, n_head, d)
    vf = xkv.v.astype(jnp.float32).reshape(l, b, t, n_head, d)
    k_s = jnp.max(jnp.abs(kf), axis=-1) / 127.0                # (L,B,T,H)
    k_q = jnp.clip(jnp.round(kf / jnp.maximum(k_s[..., None], 1e-9)),
                   -127, 127).astype(jnp.int8).reshape(l, b, t, s)
    v_s = jnp.max(jnp.abs(vf), axis=(2, 4)) / 127.0            # (L,B,H)
    v_q = jnp.clip(
        jnp.round(vf / jnp.maximum(v_s[:, :, None, :, None], 1e-9)),
        -127, 127).astype(jnp.int8).reshape(l, b, t, s)
    hp = _H_PAD - n_head
    k_s = jnp.pad(k_s, [(0, 0)] * 3 + [(0, hp)]).astype(jnp.bfloat16)
    v_s = jnp.pad(v_s, [(0, 0)] * 2 + [(0, hp)])
    return QuantCrossKV(k_q=k_q, k_s=k_s, v_q=v_q, v_s=v_s,
                        t_valid=xkv.t_valid)


def cross_kv(params: Params, config: WhisperConfig,
             enc_out: jax.Array) -> CrossKV:
    """Precompute cross-attention K/V for every decoder layer
    (whisper.cpp:2005-2074) — kept in the projections' own (B, T, S)
    layout, padded on T to the decode-kernel block size."""
    ca = params["decoder"]["blocks"]["cross_attn"]

    def one_layer(_, layer):
        k = _proj(enc_out, layer["wk"])
        v = _proj(enc_out, layer["wv"], layer["bv"])
        return None, (k, v)

    _, (k, v) = lax.scan(one_layer, None,
                         {"wk": ca["wk"], "wv": ca["wv"], "bv": ca["bv"]})
    t = k.shape[2]
    t_pad = round_cache_len(t)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    return CrossKV(k=k, v=v, t_valid=jnp.int32(t))


# ================================================================== decoder ==
class KVCache(NamedTuple):
    k: jax.Array  # (L, B, C, S) — merged-head, C = cache capacity
    v: jax.Array  # (L, B, C, S)

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def cache_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(config: WhisperConfig, batch: int,
                  cache_len: Optional[int] = None,
                  dtype=jnp.bfloat16) -> KVCache:
    """Fresh zero cache.  ``cache_len`` defaults to the model's full
    n_text_ctx rounded to the kernel block — decode loops pass the exact
    ``split + n_max`` they need, which is usually far smaller."""
    c = round_cache_len(cache_len if cache_len is not None
                        else config.n_text_ctx)
    shape = (config.n_text_layer, batch, c, config.n_text_state)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def reorder_kv_cache(cache: KVCache, src: jax.Array) -> KVCache:
    """Beam reorder: cache[:, j] <- cache[:, src[j]] (batch axis 1).

    The functional equivalent of the reference's seq_cp/seq_rm dance through
    scratch sequence ids (whisper.cpp:5402-5418).
    """
    return KVCache(k=jnp.take(cache.k, src, axis=1),
                   v=jnp.take(cache.v, src, axis=1))


def _embed(dec, tokens: jax.Array, positions: jax.Array, cdtype):
    te = dec["token_embed"]
    if isinstance(te, QuantTensor):
        # per-row dequant of the gathered embedding rows (scales are per
        # vocab row, so the gather reads int8 + one f32 scalar per token)
        x = te.q[tokens].astype(jnp.float32) * te.s[tokens][..., None]
    else:
        x = te[tokens].astype(jnp.float32)
    return (x + dec["pos_embed"][positions]).astype(cdtype)


def _logits(dec, x: jax.Array) -> jax.Array:
    """x (..., S) -> (..., V) f32 against the (possibly int8) embedding."""
    te = dec["token_embed"]
    if isinstance(te, QuantTensor):
        # logits against the SAME int8 buffer ("oi" layout: contraction
        # over S, per-vocab-row scales factor out of the sum)
        return quant_matmul(x, te, layout="oi")
    return jnp.einsum("...s,vs->...v", x, te,
                      preferred_element_type=jnp.float32)


def _dequant_xkv_layer(xkv_l, n_head: int):
    """(k_q, k_s, v_q, v_s) of one layer -> float (B, T, S) k/v."""
    k_q, k_s, v_q, v_s = xkv_l
    b, t, s = k_q.shape
    d = s // n_head
    k = (k_q.astype(jnp.float32).reshape(b, t, n_head, d)
         * k_s[..., :n_head].astype(jnp.float32)[..., None]
         ).reshape(b, t, s)
    v = (v_q.astype(jnp.float32).reshape(b, t, n_head, d)
         * v_s[:, None, :n_head, None]).reshape(b, t, s)
    return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)


def _xkv_scan_xs(xkv):
    if isinstance(xkv, QuantCrossKV):
        return (xkv.k_q, xkv.k_s, xkv.v_q, xkv.v_s)
    return (xkv.k, xkv.v)


def decoder_dense(
    params: Params,
    config: WhisperConfig,
    tokens: jax.Array,        # (B, T) int32
    positions: jax.Array,     # (B, T) int32 — absolute positions
    kv: KVCache,
    xkv,                      # CrossKV | QuantCrossKV
    n_valid,                  # (B,) or scalar — real token count <= T
    start=0,                  # cache slot of tokens[:, 0] (traced ok)
    logit_rows: Optional[jax.Array] = None,  # (B,) — only these positions
) -> Tuple[jax.Array, KVCache]:
    """Decoder over T new tokens written at cache slots [start, start+T).

    Serves the prompt pass (start=0, per-row n_valid = prompt lengths,
    padding rows masked) and whisper_decode-style incremental multi-token
    calls (start = n_past).  Cache slots < start are attended as history;
    within the new rows attention is causal and bounded by n_valid.
    The per-token autoregressive step uses ``decoder_step`` instead.

    Reference graph: whisper.cpp:2148-2505; last-position-only logits via
    ``logit_rows`` mirror the flagged-row extraction at :2536-2572.
    """
    dec = params["decoder"]
    n_head = config.n_text_head
    cdtype = param_compute_dtype(params)
    B, T = tokens.shape
    C = kv.cache_len
    quant_xkv = isinstance(xkv, QuantCrossKV)

    x = _embed(dec, tokens, positions, cdtype)
    start = jnp.asarray(start, jnp.int32)
    n_valid = jnp.broadcast_to(jnp.asarray(n_valid, jnp.int32), (B,))

    # self-attention validity over cache slots (B, 1, T, C):
    # slot c visible to query t iff causal (c <= start + t) and either
    # history (c < start) or a real row of this call (c - start < n_valid)
    c_pos = jnp.arange(C)[None, None, None, :]
    q_idx = jnp.arange(T)[None, None, :, None]
    nv = n_valid[:, None, None, None]
    ok = (c_pos <= start + q_idx) & ((c_pos < start)
                                     | (c_pos - start < nv))
    self_mask = jnp.where(ok, 0.0, _NEG_INF).astype(jnp.float32)

    # cross-attention validity over audio positions (1, 1, 1, T_pad)
    t_pad = xkv.k_q.shape[2] if quant_xkv else xkv.k.shape[2]
    xok = jnp.arange(t_pad)[None, None, None, :] < xkv.t_valid
    cross_mask = jnp.where(xok, 0.0, _NEG_INF).astype(jnp.float32)

    def heads4(z):  # (B, N, S) -> (B, N, H, D) — pure reshape, no copy
        return z.reshape(*z.shape[:-1], n_head, z.shape[-1] // n_head)

    def attend(q, k, v, mask):
        return _merge_heads(mha(q, k, v, mask))

    def one_layer(x, inputs):
        layer, kv_k, kv_v, xkv_l = inputs
        ln0, attn = layer["attn_ln"], layer["attn"]
        h = layer_norm(x, ln0["g"], ln0["b"]).astype(cdtype)
        q, k_new, v_new = _self_qkv(h, attn)

        # batch-uniform slice write at [start, start+T) — never a scatter
        kv_k = lax.dynamic_update_slice_in_dim(
            kv_k, k_new.astype(kv_k.dtype), start, axis=1)
        kv_v = lax.dynamic_update_slice_in_dim(
            kv_v, v_new.astype(kv_v.dtype), start, axis=1)

        o = attend(heads4(q), heads4(kv_k), heads4(kv_v), self_mask)
        x = x + _proj(o.astype(cdtype), attn["wo"], attn["bo"],
                      out_dtype=cdtype)

        lnc, cattn = layer["cross_attn_ln"], layer["cross_attn"]
        h = layer_norm(x, lnc["g"], lnc["b"]).astype(cdtype)
        qc = _proj(h, cattn["wq"], cattn["bq"])
        if quant_xkv:
            xk, xv = _dequant_xkv_layer(xkv_l, n_head)
        else:
            xk, xv = xkv_l
        oc = attend(heads4(qc), heads4(xk), heads4(xv), cross_mask)
        x = x + _proj(oc.astype(cdtype), cattn["wo"], cattn["bo"],
                      out_dtype=cdtype)

        ln1, mlp = layer["mlp_ln"], layer["mlp"]
        h = layer_norm(x, ln1["g"], ln1["b"]).astype(cdtype)
        h = jax.nn.gelu(_proj(h, mlp["w0"], mlp["b0"]), approximate=False)
        h = _proj(h.astype(cdtype), mlp["w1"], mlp["b1"], out_dtype=cdtype)
        x = (x + h).astype(cdtype)
        return x, (kv_k, kv_v)

    x, (new_k, new_v) = lax.scan(
        lambda c, inp: one_layer(c, inp), x,
        (dec["blocks"], kv.k, kv.v, _xkv_scan_xs(xkv)))

    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"]).astype(cdtype)
    if logit_rows is not None:
        x = x[jnp.arange(B), logit_rows][:, None]            # (B, 1, S)
    return _logits(dec, x), KVCache(k=new_k, v=new_v)


def decoder_step(
    params: Params,
    config: WhisperConfig,
    token: jax.Array,         # (B,) int32
    pos: jax.Array,           # (B,) int32 — true autoregressive position
    kv: KVCache,
    xkv,                      # CrossKV | QuantCrossKV
    lo: jax.Array,            # (B,) — per-row prompt length
    slot: jax.Array,          # scalar — cache slot (batch-uniform)
    split: int,               # static prompt capacity: slots [lo, split)
                              # are the masked per-row gap
    kv_group: int = 1,        # xkv batch = B // kv_group: groups of
                              # kv_group rows (beams of one stream) share
                              # one cross-KV row
    kv_prompt: Optional[KVCache] = None,
                              # SPLIT-CACHE beam mode: the prompt KV
                              # stored once per beam group, (L, G, CP, S)
                              # with G = B // beam_size.  ``kv`` is then
                              # the per-beam LIVE cache (L, B, NL, S),
                              # ``slot`` the live slot (= step i, no
                              # prompt offset) and self-attention runs
                              # the two-source ops/split_attention.py
                              # kernel.  ``split`` is ignored.
    rowmap: Optional[jax.Array] = None,
                              # (B, NL) i32 zero-copy beam-merge row
                              # map for the split live cache: beam b's
                              # slot t lives at group row rowmap[b, t]
                              # (ops/split_attention.py).  The NEW
                              # token always writes to the beam's own
                              # row; rowmap[:, slot] must equal the own
                              # row at call time.
) -> Tuple[jax.Array, KVCache]:
    """THE autoregressive hot step: one token per row, fused decode
    attention, one uniform-slot cache write per layer.

    The slot/position decoupling: ``pos`` (= n_prompt + i) drives the
    positional embedding and the decode state machine, while the cache
    slot is the batch-uniform ``split + i`` — per-row prompt lengths
    become mask parameters instead of per-row write offsets (a scatter).

    The KV cache rides the layer scan as CARRY, updated in place by a
    4-D ``dynamic_update_slice`` at (layer, 0, slot, 0), and the
    attention kernels read the full stacked cache with the layer index
    in their BlockSpec index maps.  An earlier structure that threaded
    per-layer cache slices through scan xs/ys re-materialized the ENTIRE
    cache every token step (the ys stacking is a fresh allocation and
    xs slicing cannot fuse into a Pallas call) — ~125 MB/step of pure
    copy at tiny/beam-5/batch-8, measured as the bulk of the decode
    step.  Returns (logits (B, V) f32, new kv).
    """
    from ..ops.decode_attention import decode_attention
    from ..ops.cross_attention import cross_attention_quant
    from ..ops.split_attention import split_beam_attention

    dec = params["decoder"]
    n_head = config.n_text_head
    cdtype = param_compute_dtype(params)
    B = token.shape[0]
    quant_xkv = isinstance(xkv, QuantCrossKV)
    t_pad = xkv.k_q.shape[2] if quant_xkv else xkv.k.shape[2]
    lo = jnp.asarray(lo, jnp.int32).reshape(B)
    slot = jnp.asarray(slot, jnp.int32)
    hi = slot + 1
    cross_lo = jnp.broadcast_to(xkv.t_valid, (B,)).astype(jnp.int32)
    beam_group = (B // kv_prompt.k.shape[1]
                  if kv_prompt is not None else 1)

    x = _embed(dec, token, pos, cdtype)                       # (B, S)
    n_layer = config.n_text_layer
    zero = jnp.int32(0)

    def one_layer(carry, inputs):
        x, kv_k, kv_v = carry
        layer, l_idx = inputs
        ln0, attn = layer["attn_ln"], layer["attn"]
        h = layer_norm(x, ln0["g"], ln0["b"]).astype(cdtype)
        q, k_new, v_new = _self_qkv(h, attn)

        # in-place single-slot write into the scan-carried full cache
        kv_k = lax.dynamic_update_slice(
            kv_k, k_new[None, :, None, :].astype(kv_k.dtype),
            (l_idx, zero, slot, zero))
        kv_v = lax.dynamic_update_slice(
            kv_v, v_new[None, :, None, :].astype(kv_v.dtype),
            (l_idx, zero, slot, zero))

        if kv_prompt is not None:
            o = split_beam_attention(
                q, kv_prompt.k, kv_prompt.v, kv_k, kv_v, lo, hi,
                n_head=n_head, kv_group=beam_group, layer=l_idx,
                rowmap=rowmap)
        else:
            o = decode_attention(q, kv_k, kv_v, lo, hi,
                                 split=split, n_head=n_head,
                                 layer=l_idx)
        x = x + _proj(o.astype(cdtype), attn["wo"], attn["bo"],
                      out_dtype=cdtype)

        lnc, cattn = layer["cross_attn_ln"], layer["cross_attn"]
        h = layer_norm(x, lnc["g"], lnc["b"]).astype(cdtype)
        qc = _proj(h, cattn["wq"], cattn["bq"])
        if quant_xkv:
            oc = cross_attention_quant(
                qc, xkv.k_q, xkv.k_s, xkv.v_q, xkv.v_s, n_head=n_head,
                t_valid=cross_lo, layer=l_idx, kv_group=kv_group)
        else:
            oc = decode_attention(qc, xkv.k, xkv.v, cross_lo,
                                  jnp.int32(0), split=t_pad,
                                  n_head=n_head, kv_group=kv_group,
                                  layer=l_idx)
        x = x + _proj(oc.astype(cdtype), cattn["wo"], cattn["bo"],
                      out_dtype=cdtype)

        ln1, mlp = layer["mlp_ln"], layer["mlp"]
        h = layer_norm(x, ln1["g"], ln1["b"]).astype(cdtype)
        h = jax.nn.gelu(_proj(h, mlp["w0"], mlp["b0"]), approximate=False)
        h = _proj(h.astype(cdtype), mlp["w1"], mlp["b1"], out_dtype=cdtype)
        x = (x + h).astype(cdtype)
        return (x, kv_k, kv_v), None

    (x, new_k, new_v), _ = lax.scan(
        one_layer, (x, kv.k, kv.v),
        (dec["blocks"], jnp.arange(n_layer, dtype=jnp.int32)))

    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"]).astype(cdtype)
    return _logits(dec, x), KVCache(k=new_k, v=new_v)
