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
- the KV cache is a fixed-shape functional array
  ``(layers, batch, heads, n_text_ctx, head_dim)`` — HEAD-MAJOR so the
  physical layout matches what the attention score contraction reads every
  decode step (a seq-major cache costs a full-cache layout-conversion copy
  per step inside the device-resident loops) — updated with
  ``dynamic_update_slice``; beam reorder is a gather on the batch axis,
  replacing the reference's cell/seq-id mutation machinery
  (whisper.cpp:639-1054);
- masks are computed from positions, never materialized per sequence;
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
    """Multi-head attention core over a CACHED key/value layout.

    q: (B, Tq, H, Dh); k/v: (B, H, Tk, Dh) — the head-major physical
    layout every KV cache in this framework stores (KVCache/CrossKV).
    Scores consume k/v directly with no per-step transpose: inside the
    device-resident decode loops a (B, Tk, H, Dh) cache forced XLA to
    insert a layout-conversion copy of the FULL cross-KV on every decoder
    step (~37 MB/step at B=8, measured ~40% of step time).  mask
    broadcastable to (B, H, Tq, Tk) — additive, float32.  Returns
    (B, Tq, H, Dh).  Softmax in float32; the 1/sqrt(Dh) scale is applied
    here (the reference splits it across pre-scaled Q and K,
    whisper.cpp:1835-1845 — numerically equivalent).
    """
    dh = q.shape[-1]
    scale = jnp.float32(1.0 / (dh ** 0.5))
    scores = jnp.einsum("bqhd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out


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

    from ..ops.attention import flash_attention

    def block(x, layer):
        ln0, attn, ln1, mlp = (layer["attn_ln"], layer["attn"],
                               layer["mlp_ln"], layer["mlp"])
        h = layer_norm(x, ln0["g"], ln0["b"]).astype(cdtype)
        q = _heads(_proj(h, attn["wq"], attn["bq"]), n_head)
        k = _heads(_proj(h, attn["wk"]), n_head)
        v = _heads(_proj(h, attn["wv"], attn["bv"]), n_head)
        # dense self-attention via the Pallas flash kernel (einsum on CPU)
        o = _merge_heads(flash_attention(q, k, v)).astype(cdtype)
        x = x + _proj(o, attn["wo"], attn["bo"], out_dtype=cdtype)

        h = layer_norm(x, ln1["g"], ln1["b"]).astype(cdtype)
        h = jax.nn.gelu(_proj(h, mlp["w0"], mlp["b0"]), approximate=False)
        h = _proj(h.astype(cdtype), mlp["w1"], mlp["b1"], out_dtype=cdtype)
        return (x + h).astype(cdtype), None

    x, _ = lax.scan(lambda carry, layer: block(carry, layer), x, blocks)
    x = layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"])
    return x.astype(cdtype)


# ================================================================= cross-KV ==
class CrossKV(NamedTuple):
    k: jax.Array  # (L, B, H, n_audio_ctx, Dh) — head-major (see mha)
    v: jax.Array  # (L, B, H, n_audio_ctx, Dh)


class QuantCrossKV(NamedTuple):
    """Int8-quantized cross-attention KV.

    large-v3 decode is HBM-bandwidth-bound and the cross KV is its largest
    per-step read (L*B*1500*H*D * 2 tensors); int8 storage halves that.
    K keeps a per-(position, head) scale (factorable out of the score
    contraction); V uses a per-head scale (must factor out of the
    probs-weighted sum).  Opt-in via TranscribeParams.cross_kv_int8.
    """

    k_q: jax.Array  # (L, B, H, T, Dh) int8 — head-major (see mha)
    k_s: jax.Array  # (L, B, H, T) f32
    v_q: jax.Array  # (L, B, H, T, Dh) int8
    v_s: jax.Array  # (L, B, H) f32


def quantize_cross_kv(xkv: CrossKV) -> QuantCrossKV:
    kf = xkv.k.astype(jnp.float32)                             # (L,B,H,T,D)
    vf = xkv.v.astype(jnp.float32)
    k_s = jnp.max(jnp.abs(kf), axis=-1) / 127.0                # (L,B,H,T)
    k_q = jnp.clip(jnp.round(kf / jnp.maximum(k_s[..., None], 1e-9)),
                   -127, 127).astype(jnp.int8)
    v_s = jnp.max(jnp.abs(vf), axis=(3, 4)) / 127.0            # (L,B,H)
    v_q = jnp.clip(
        jnp.round(vf / jnp.maximum(v_s[..., None, None], 1e-9)),
        -127, 127).astype(jnp.int8)
    return QuantCrossKV(k_q=k_q, k_s=k_s, v_q=v_q, v_s=v_s)


def mha_cross_quant(q: jax.Array, k_q: jax.Array, k_s: jax.Array,
                    v_q: jax.Array, v_s: jax.Array) -> jax.Array:
    """Cross attention against int8 KV: Pallas kernel with in-VMEM dequant
    on TPU (ops/cross_attention.py), float dequant einsum elsewhere.
    q: (B, Tq, H, D)."""
    from ..ops.cross_attention import cross_attention_quant
    return cross_attention_quant(q, k_q, k_s, v_q, v_s)


def cross_kv(params: Params, config: WhisperConfig,
             enc_out: jax.Array) -> CrossKV:
    """Precompute cross-attention K/V for every decoder layer
    (whisper.cpp:2005-2074)."""
    n_head = config.n_text_head
    ca = params["decoder"]["blocks"]["cross_attn"]

    def one_layer(_, layer):
        k = _heads(_proj(enc_out, layer["wk"]), n_head)
        v = _heads(_proj(enc_out, layer["wv"], layer["bv"]), n_head)
        # head-major physical layout: the decode loops read this every
        # step; transposing ONCE here beats a per-step conversion copy
        return None, (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

    _, (k, v) = lax.scan(one_layer, None,
                         {"wk": ca["wk"], "wv": ca["wv"], "bv": ca["bv"]})
    return CrossKV(k=k, v=v)


# ================================================================== decoder ==
class KVCache(NamedTuple):
    k: jax.Array  # (L, B, H, n_text_ctx, Dh) — head-major (see mha)
    v: jax.Array  # (L, B, H, n_text_ctx, Dh)

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_kv_cache(config: WhisperConfig, batch: int,
                  dtype=jnp.bfloat16) -> KVCache:
    shape = (config.n_text_layer, batch, config.n_text_head,
             config.n_text_ctx, config.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def reorder_kv_cache(cache: KVCache, src: jax.Array) -> KVCache:
    """Beam reorder: cache[:, j] <- cache[:, src[j]] (batch axis 1).

    The functional equivalent of the reference's seq_cp/seq_rm dance through
    scratch sequence ids (whisper.cpp:5402-5418).
    """
    return KVCache(k=jnp.take(cache.k, src, axis=1),
                   v=jnp.take(cache.v, src, axis=1))


def decoder_forward(
    params: Params,
    config: WhisperConfig,
    tokens: jax.Array,        # (B, T) int32
    positions: jax.Array,     # (B, T) int32 — absolute positions
    kv: KVCache,
    xkv: CrossKV,
    self_mask: jax.Array,     # (B, 1, T, n_text_ctx) additive f32
    logit_rows: Optional[jax.Array] = None,  # (B,) — only these T-positions
    seq_from_zero: bool = False,  # positions == arange(T): KV write is a
                                  # static-offset slice update, not a scatter
    slot: Optional[jax.Array] = None,  # scalar cache slot: every row's new
                                       # KV lands at the SAME slot — a
                                       # dynamic_update_slice, not a scatter
    unroll: int = 1,          # layer-scan unroll factor
) -> Tuple[jax.Array, KVCache]:
    """Decoder over T new tokens per batch row; returns (logits, new kv).

    Works for both the prompt pass (T = padded prompt length) and the
    autoregressive step (T = 1) — the reference builds a fresh ggml graph
    per call (whisper.cpp:2148-2505); here both modes are the same traced
    function, distinguished only by static T.

    KV writes land at ``positions`` via one scatter per layer.
    logits: (B, T, n_vocab) float32 — or (B, 1, n_vocab) when
    ``logit_rows`` selects one position per row (the prompt pass needs only
    the final position's logits; computing all T against the 51k vocab
    costs T× the FLOPs and materializes a (B, T, V) f32 buffer — the
    reference likewise extracts only flagged rows, whisper.cpp:2536-2572).
    """
    dec = params["decoder"]
    n_head = config.n_text_head
    te = dec["token_embed"]
    quant_te = isinstance(te, QuantTensor)
    cdtype = jnp.bfloat16 if quant_te else te.dtype
    B, T = tokens.shape

    if quant_te:
        # per-row dequant of the gathered embedding rows (scales are per
        # vocab row, so the gather reads int8 + one f32 scalar per token)
        x = te.q[tokens].astype(jnp.float32) * te.s[tokens][..., None]
    else:
        x = te[tokens].astype(jnp.float32)
    x = x + dec["pos_embed"][positions]
    x = x.astype(cdtype)

    blocks = dec["blocks"]
    # batch indices for the KV scatter: (B, T)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    quant_xkv = isinstance(xkv, QuantCrossKV)

    # Scan over the layer axis of both the stacked weights and the caches.
    def one_layer(x, inputs):
        layer, kv_k, kv_v, xkv_l = inputs
        ln0 = layer["attn_ln"]
        attn = layer["attn"]
        h = layer_norm(x, ln0["g"], ln0["b"]).astype(cdtype)
        q = _heads(_proj(h, attn["wq"], attn["bq"]), n_head)
        k_new = _heads(_proj(h, attn["wk"]), n_head)
        v_new = _heads(_proj(h, attn["wv"], attn["bv"]), n_head)

        # write new K/V into the cache at `positions`
        # cache layer layout (B, H, ctx, Dh); k_new/v_new are (B, T, H, Dh)
        if seq_from_zero:
            kv_k = lax.dynamic_update_slice_in_dim(
                kv_k, k_new.transpose(0, 2, 1, 3).astype(kv_k.dtype),
                0, axis=2)
            kv_v = lax.dynamic_update_slice_in_dim(
                kv_v, v_new.transpose(0, 2, 1, 3).astype(kv_v.dtype),
                0, axis=2)
        elif slot is not None:
            # uniform-slot write: one dynamic_update_slice on the seq axis
            # (in-place on TPU) instead of a B-row scatter
            kv_k = lax.dynamic_update_slice_in_dim(
                kv_k, k_new.transpose(0, 2, 1, 3).astype(kv_k.dtype),
                slot, axis=2)
            kv_v = lax.dynamic_update_slice_in_dim(
                kv_v, v_new.transpose(0, 2, 1, 3).astype(kv_v.dtype),
                slot, axis=2)
        else:
            # advanced (B,1)+(B,T) indices around the sliced head axis:
            # result group leads -> update shape (B, T, H, Dh) == k_new
            kv_k = kv_k.at[b_idx[:, :1], :, positions].set(
                k_new.astype(kv_k.dtype))
            kv_v = kv_v.at[b_idx[:, :1], :, positions].set(
                v_new.astype(kv_v.dtype))

        o = _merge_heads(mha(q, kv_k, kv_v, self_mask)).astype(cdtype)
        x = x + _proj(o, attn["wo"], attn["bo"], out_dtype=cdtype)

        lnc = layer["cross_attn_ln"]
        cattn = layer["cross_attn"]
        h = layer_norm(x, lnc["g"], lnc["b"]).astype(cdtype)
        qc = _heads(_proj(h, cattn["wq"], cattn["bq"]), n_head)
        if quant_xkv:
            oc_h = mha_cross_quant(qc, *xkv_l)
        else:
            oc_h = mha(qc, *xkv_l)
        oc = _merge_heads(oc_h).astype(cdtype)
        x = x + _proj(oc, cattn["wo"], cattn["bo"], out_dtype=cdtype)

        ln1 = layer["mlp_ln"]
        mlp = layer["mlp"]
        h = layer_norm(x, ln1["g"], ln1["b"]).astype(cdtype)
        h = jax.nn.gelu(_proj(h, mlp["w0"], mlp["b0"]), approximate=False)
        h = _proj(h.astype(cdtype), mlp["w1"], mlp["b1"], out_dtype=cdtype)
        x = (x + h).astype(cdtype)
        return x, (kv_k, kv_v)

    xkv_xs = ((xkv.k_q, xkv.k_s, xkv.v_q, xkv.v_s) if quant_xkv
              else (xkv.k, xkv.v))
    x, (new_k, new_v) = lax.scan(
        lambda c, inp: one_layer(c, inp), x,
        (blocks, kv.k, kv.v, xkv_xs), unroll=unroll)

    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"]).astype(cdtype)
    if logit_rows is not None:
        x = x[jnp.arange(B), logit_rows][:, None]            # (B, 1, S)
    if quant_te:
        # logits against the SAME int8 buffer ("oi" layout: contraction
        # over S, per-vocab-row scales factor out of the sum)
        logits = quant_matmul(x, te, layout="oi")
    else:
        logits = jnp.einsum("bts,vs->btv", x, te,
                            preferred_element_type=jnp.float32)
    return logits, KVCache(k=new_k, v=new_v)


def causal_prompt_mask(config: WhisperConfig, n_prompt: jax.Array,
                       T: int, batch: int) -> jax.Array:
    """Additive mask for a padded prompt pass.

    Token t (absolute position t) attends to cache positions <= t and only
    within [0, n_prompt).  Padding rows (t >= n_prompt) are fully masked to
    position 0 to stay numerically finite.  ``n_prompt`` may be a scalar or
    per-batch (B,) — per-stream batching uses row-specific prompt lengths.
    """
    ctx = config.n_text_ctx
    q_pos = jnp.arange(T)[None, :, None]
    k_pos = jnp.arange(ctx)[None, None, :]
    npb = jnp.asarray(n_prompt).reshape(-1, 1, 1)  # (1,) or (B,)
    ok = (k_pos <= q_pos) & (k_pos < npb)
    ok = ok | (k_pos == 0)
    mask = jnp.where(ok, 0.0, _NEG_INF).astype(jnp.float32)  # (b?,T,ctx)
    return jnp.broadcast_to(mask[:, None], (batch, 1, T, ctx))


def step_mask(config: WhisperConfig, n_past: jax.Array,
              batch: int) -> jax.Array:
    """Additive mask for a single-token step at position ``n_past``:
    attend to cache positions <= n_past."""
    ctx = config.n_text_ctx
    k_pos = jnp.arange(ctx)[None, None, None, :]
    ok = k_pos <= n_past.reshape(-1, 1, 1, 1)
    return jnp.where(ok, 0.0, _NEG_INF).astype(jnp.float32)
