"""Export a parameter pytree back to a ggml ``.bin`` checkpoint.

Inverse of ``params_from_raw``: serializes the framework pytree into the
reference's tensor naming/orientation (whisper.cpp:1354-1510) so models —
including ones fine-tuned with models/training.py — stay interoperable
with every ggml consumer.  The reference has no equivalent (conversion is
one-way via convert-pt-to-ggml.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .config import WhisperConfig
from . import loader_ggml


def _np32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _t(x) -> np.ndarray:
    """(in, out) framework orientation -> ggml's torch-style (out, in)."""
    return np.ascontiguousarray(_np32(x).T)


def params_to_tensors(params, config: WhisperConfig,
                      ttype: int = loader_ggml.GGML_TYPE_F16
                      ) -> Dict[str, Tuple[np.ndarray, int]]:
    """Framework pytree -> {ggml name: (array, ggml type)}."""
    F32 = loader_ggml.GGML_TYPE_F32
    out: Dict[str, Tuple[np.ndarray, int]] = {}
    enc, dec = params["encoder"], params["decoder"]

    out["encoder.positional_embedding"] = (_np32(enc["pos_embed"]), F32)
    out["encoder.conv1.weight"] = (
        _np32(enc["conv1"]["w"]).transpose(2, 1, 0), ttype)
    out["encoder.conv1.bias"] = (
        _np32(enc["conv1"]["b"]).reshape(-1, 1), F32)
    out["encoder.conv2.weight"] = (
        _np32(enc["conv2"]["w"]).transpose(2, 1, 0), ttype)
    out["encoder.conv2.bias"] = (
        _np32(enc["conv2"]["b"]).reshape(-1, 1), F32)
    out["encoder.ln_post.weight"] = (_np32(enc["ln_post"]["g"]), F32)
    out["encoder.ln_post.bias"] = (_np32(enc["ln_post"]["b"]), F32)

    def emit_attn(prefix: str, a, i: int) -> None:
        out[f"{prefix}.query.weight"] = (_t(a["wq"][i]), ttype)
        out[f"{prefix}.query.bias"] = (_np32(a["bq"][i]), F32)
        out[f"{prefix}.key.weight"] = (_t(a["wk"][i]), ttype)
        out[f"{prefix}.value.weight"] = (_t(a["wv"][i]), ttype)
        out[f"{prefix}.value.bias"] = (_np32(a["bv"][i]), F32)
        out[f"{prefix}.out.weight"] = (_t(a["wo"][i]), ttype)
        out[f"{prefix}.out.bias"] = (_np32(a["bo"][i]), F32)

    def emit_blocks(side: str, blocks, n_layer: int, cross: bool) -> None:
        for i in range(n_layer):
            p = f"{side}.blocks.{i}"
            out[f"{p}.attn_ln.weight"] = (_np32(blocks["attn_ln"]["g"][i]),
                                          F32)
            out[f"{p}.attn_ln.bias"] = (_np32(blocks["attn_ln"]["b"][i]),
                                        F32)
            emit_attn(f"{p}.attn", blocks["attn"], i)
            if cross:
                out[f"{p}.cross_attn_ln.weight"] = (
                    _np32(blocks["cross_attn_ln"]["g"][i]), F32)
                out[f"{p}.cross_attn_ln.bias"] = (
                    _np32(blocks["cross_attn_ln"]["b"][i]), F32)
                emit_attn(f"{p}.cross_attn", blocks["cross_attn"], i)
            out[f"{p}.mlp_ln.weight"] = (_np32(blocks["mlp_ln"]["g"][i]),
                                         F32)
            out[f"{p}.mlp_ln.bias"] = (_np32(blocks["mlp_ln"]["b"][i]), F32)
            out[f"{p}.mlp.0.weight"] = (_t(blocks["mlp"]["w0"][i]), ttype)
            out[f"{p}.mlp.0.bias"] = (_np32(blocks["mlp"]["b0"][i]), F32)
            out[f"{p}.mlp.2.weight"] = (_t(blocks["mlp"]["w1"][i]), ttype)
            out[f"{p}.mlp.2.bias"] = (_np32(blocks["mlp"]["b1"][i]), F32)

    emit_blocks("encoder", enc["blocks"], config.n_audio_layer, False)
    emit_blocks("decoder", dec["blocks"], config.n_text_layer, True)

    out["decoder.positional_embedding"] = (_np32(dec["pos_embed"]), F32)
    out["decoder.token_embedding.weight"] = (_np32(dec["token_embed"]),
                                             ttype)
    out["decoder.ln.weight"] = (_np32(dec["ln"]["g"]), F32)
    out["decoder.ln.bias"] = (_np32(dec["ln"]["b"]), F32)
    return out


def export_checkpoint(
    path: str,
    params,
    config: WhisperConfig,
    mel_filters: np.ndarray,
    vocab_tokens: List[bytes],
    *,
    ttype: Optional[int] = None,
) -> None:
    """Write a loadable ggml .bin from a parameter pytree."""
    ttype = loader_ggml.GGML_TYPE_F16 if ttype is None else ttype
    ftype = {loader_ggml.GGML_TYPE_F32: 0,
             loader_ggml.GGML_TYPE_F16: 1}.get(ttype, 1)
    tensors = params_to_tensors(params, config, ttype)
    loader_ggml.write_checkpoint(path, config, mel_filters, vocab_tokens,
                                 tensors, ftype=ftype)
