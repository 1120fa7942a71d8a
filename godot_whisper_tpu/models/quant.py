"""Int8 decoder quantization: the runtime-compute half of ggml-quants' role.

The loader (loader_ggml.py) already reads the reference's q4/q5/q8 block
formats but dequantized everything to bf16 — so quantized checkpoints paid
full-width HBM reads at decode time.  This transform re-quantizes the
DECODER weights to int8 with per-output-channel scales (ops/qmatmul.py)
after load:

- decode is the bandwidth-bound stage (every step reads every decoder
  weight once; docs/SCALING.md) — int8 halves that traffic;
- the encoder stays bf16: it is MXU-compute-bound at batch and its
  output feeds the quality-critical cross-KV, so there is nothing to win;
- the token embedding quantizes per vocab row (V, S): the same int8
  buffer serves the embedding gather and the logits contraction.

Inference-only (quantized pytrees are not differentiable); training keeps
bf16 params (models/training.py).
"""

from __future__ import annotations

from typing import Any, Dict

from ..ops.qmatmul import (QuantTensor, Quant4Tensor, quantize_tensor,
                           quantize_tensor4)

Params = Dict[str, Any]

# matmul-weight keys inside decoder blocks, all stored (L, S_in, O_out):
# per-output-channel scales -> reduce over axis 1.
_BLOCK_WEIGHT_KEYS = ("wq", "wk", "wv", "wo", "w0", "w1")


def _fuse_self_qkv(attn: Dict[str, Any], quantize_fn) -> Dict[str, Any]:
    """Fuse the self-attention q/k/v projections into ONE weight for the
    quantized decode path: (L, S, 3S) wqkv + (L, 3S) bqkv (bk = 0 — K
    has no bias, whisper.cpp:1839-1842).  Per-output-channel scales make
    quantize(concat) == concat(quantize) exactly, so this is bit-
    identical to three separate projections while cutting 2 kernel
    dispatches per layer per token — at large-v3 B=1 the int8 step is
    dispatch-bound (~300 Pallas calls/step, r5 job 091/093)."""
    import jax.numpy as jnp
    wqkv = jnp.concatenate([attn["wq"], attn["wk"], attn["wv"]], axis=-1)
    bqkv = jnp.concatenate(
        [attn["bq"], jnp.zeros_like(attn["bq"]), attn["bv"]], axis=-1)
    return {"wqkv": quantize_fn(wqkv), "bqkv": bqkv}


def quantize_decoder_int8(params: Params) -> Params:
    """Return a copy of the param pytree with decoder matmul weights and
    the token embedding as int8 QuantTensors (self qkv fused into one
    weight — see _fuse_self_qkv).  Idempotent."""
    dec = params["decoder"]
    new_blocks: Dict[str, Any] = {}
    for group, sub in dec["blocks"].items():
        new_sub = {}
        for k, v in sub.items():
            if k in _BLOCK_WEIGHT_KEYS and not isinstance(v, QuantTensor):
                new_sub[k] = quantize_tensor(v, reduce_axis=1)
            else:
                new_sub[k] = v
        if group == "attn" and "wq" in sub and not isinstance(
                sub["wq"], QuantTensor):
            for k in ("wq", "wk", "wv", "bq", "bv"):
                new_sub.pop(k, None)
            new_sub.update(_fuse_self_qkv(
                sub, lambda w: quantize_tensor(w, reduce_axis=1)))
        new_blocks[group] = new_sub

    te = dec["token_embed"]
    if not isinstance(te, QuantTensor):
        te = quantize_tensor(te, reduce_axis=1)  # (V, S): per-row scales

    new_dec = dict(dec)
    new_dec["blocks"] = new_blocks
    new_dec["token_embed"] = te
    return {"encoder": params["encoder"], "decoder": new_dec}


def quantize_decoder_int4(params: Params, *, group: int = 128) -> Params:
    """Int4 (W4A16) decoder weights — the role of ggml's q4_0 format
    (whisper.cpp ships q4 as its flagship quantization;
    ggml-quants.c dot kernels dequantize 32-element blocks in-register).
    Here: ``group``-row scales along the contraction axis, nibble-packed
    buffers unpacked in VMEM (ops/qmatmul.py Quant4Tensor) — quarter the
    decode HBM weight traffic of bf16.

    The token embedding stays int8 (per-vocab-row scales): it serves the
    embedding gather AND the logits contraction, where 4-bit per-row error
    lands directly on the token distribution.  Idempotent."""
    dec = params["decoder"]
    new_blocks: Dict[str, Any] = {}
    int8_fallbacks = []
    for grp, sub in dec["blocks"].items():
        new_sub = {}
        for k, v in sub.items():
            if (k in _BLOCK_WEIGHT_KEYS
                    and not isinstance(v, (QuantTensor, Quant4Tensor))):
                s_in = v.shape[-2]
                if s_in % group == 0:
                    new_sub[k] = quantize_tensor4(v, group=group)
                else:  # non-divisible contraction dim: keep int8
                    new_sub[k] = quantize_tensor(v, reduce_axis=1)
                    int8_fallbacks.append(f"{grp}.{k}")
            else:
                new_sub[k] = v
        if grp == "attn" and "wq" in sub and not isinstance(
                sub["wq"], (QuantTensor, Quant4Tensor)):
            for k in ("wq", "wk", "wv", "bq", "bv"):
                new_sub.pop(k, None)
            s_in = sub["wq"].shape[-2]
            if s_in % group == 0:
                new_sub.update(_fuse_self_qkv(
                    sub, lambda w: quantize_tensor4(w, group=group)))
            else:
                new_sub.update(_fuse_self_qkv(
                    sub, lambda w: quantize_tensor(w, reduce_axis=1)))
                int8_fallbacks.append(f"{grp}.wqkv")
        new_blocks[grp] = new_sub
    if int8_fallbacks:
        from ..runtime.logging import log_warn
        log_warn("quantize_decoder_int4: contraction dim not divisible by "
                 f"group={group} for {int8_fallbacks}; those weights kept "
                 "int8 (check quant_mode() for the landed precision)")

    te = dec["token_embed"]
    if not isinstance(te, QuantTensor):
        te = quantize_tensor(te, reduce_axis=1)

    new_dec = dict(dec)
    new_dec["blocks"] = new_blocks
    new_dec["token_embed"] = te
    return {"encoder": params["encoder"], "decoder": new_dec}


def is_quantized(params: Params) -> bool:
    return isinstance(params["decoder"]["token_embed"], QuantTensor)


def quant_mode(params: Params) -> Dict[str, str]:
    """Which precision actually landed, per decoder weight key.

    Returns {"blocks.<group>.<key>": "int4" | "int8" | "bf16"/..., and
    "token_embed": ...} so benches and tests can assert the intended
    precision took effect (quantize_decoder_int4 silently keeps int8 for
    weights whose contraction dim does not divide the group size)."""
    def kind(v) -> str:
        if isinstance(v, Quant4Tensor):
            return "int4"
        if isinstance(v, QuantTensor):
            return "int8"
        return str(v.dtype)

    out = {"token_embed": kind(params["decoder"]["token_embed"])}
    for grp, sub in params["decoder"]["blocks"].items():
        for k, v in sub.items():
            if k in _BLOCK_WEIGHT_KEYS or k == "wqkv":
                out[f"blocks.{grp}.{k}"] = kind(v)
    return out


def quantize_embed_int8(params: Params) -> Params:
    """int8-quantize ONLY the token embedding — the (V, S) buffer whose
    logits-contraction read dominates the per-token step at small batch
    (~40 MB bf16 for the 51864-row vocab, ~120 us of a ~170 us tiny.en
    B=1 step).  The per-row scales serve both the embedding gather and
    the logits matmul; every other decoder weight stays bf16 (full int8
    measured SLOWER at B=1: the small projection matmuls lose more to
    the int8 kernel's overhead than their halved reads save).
    Idempotent."""
    dec = params["decoder"]
    te = dec["token_embed"]
    if isinstance(te, QuantTensor):
        return params
    new_dec = dict(dec)
    new_dec["token_embed"] = quantize_tensor(te, reduce_axis=1)
    return {"encoder": params["encoder"], "decoder": new_dec}
