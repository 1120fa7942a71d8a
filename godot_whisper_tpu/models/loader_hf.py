"""HuggingFace Whisper checkpoint conversion.

Native alternative to the ggml path: converts a transformers Whisper state
dict (``openai/whisper-*`` layout) into the framework pytree.  This is also
how forward-pass parity is tested against ``transformers`` on CPU without
any network access (random weights flow through both stacks).

The reference has no HF loader — it relies on the offline
``models/convert-pt-to-ggml.py`` conversion; here conversion is first-class.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

import jax
import jax.numpy as jnp

from .config import WhisperConfig, config_from_hparams
from .params import Params, cast_params


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(_np(x).T)


def config_from_hf(hf_config) -> WhisperConfig:
    """Build a WhisperConfig from a transformers WhisperConfig."""
    return config_from_hparams(
        n_vocab=hf_config.vocab_size,
        n_audio_ctx=hf_config.max_source_positions,
        n_audio_state=hf_config.d_model,
        n_audio_head=hf_config.encoder_attention_heads,
        n_audio_layer=hf_config.encoder_layers,
        n_text_ctx=hf_config.max_target_positions,
        n_text_state=hf_config.d_model,
        n_text_head=hf_config.decoder_attention_heads,
        n_text_layer=hf_config.decoder_layers,
        n_mels=hf_config.num_mel_bins,
    )


def params_from_hf_state_dict(
    sd: Mapping[str, Any],
    config: WhisperConfig,
    *,
    compute_dtype=jnp.bfloat16,
    prefix: str = "model.",
) -> Params:
    """Convert an HF Whisper state dict to the framework pytree.

    Handles both ``model.``-prefixed (WhisperForConditionalGeneration) and
    bare (WhisperModel) key layouts.
    """
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""

    def g(name: str) -> np.ndarray:
        return _np(sd[prefix + name])

    def gt(name: str) -> np.ndarray:
        return _t(sd[prefix + name])

    def attn_stack(side: str, kind: str, n_layer: int) -> Dict[str, np.ndarray]:
        out = {"wq": [], "bq": [], "wk": [], "wv": [], "bv": [], "wo": [],
               "bo": []}
        for i in range(n_layer):
            p = f"{side}.layers.{i}.{kind}"
            out["wq"].append(gt(f"{p}.q_proj.weight"))
            out["bq"].append(g(f"{p}.q_proj.bias"))
            out["wk"].append(gt(f"{p}.k_proj.weight"))
            out["wv"].append(gt(f"{p}.v_proj.weight"))
            out["bv"].append(g(f"{p}.v_proj.bias"))
            out["wo"].append(gt(f"{p}.out_proj.weight"))
            out["bo"].append(g(f"{p}.out_proj.bias"))
        return {k: np.stack(v) for k, v in out.items()}

    def ln_stack(side: str, name: str, n_layer: int) -> Dict[str, np.ndarray]:
        return {
            "g": np.stack([g(f"{side}.layers.{i}.{name}.weight")
                           for i in range(n_layer)]),
            "b": np.stack([g(f"{side}.layers.{i}.{name}.bias")
                           for i in range(n_layer)]),
        }

    def mlp_stack(side: str, n_layer: int) -> Dict[str, np.ndarray]:
        return {
            "w0": np.stack([gt(f"{side}.layers.{i}.fc1.weight")
                            for i in range(n_layer)]),
            "b0": np.stack([g(f"{side}.layers.{i}.fc1.bias")
                            for i in range(n_layer)]),
            "w1": np.stack([gt(f"{side}.layers.{i}.fc2.weight")
                            for i in range(n_layer)]),
            "b1": np.stack([g(f"{side}.layers.{i}.fc2.bias")
                            for i in range(n_layer)]),
        }

    La, Lt = config.n_audio_layer, config.n_text_layer

    encoder = {
        "pos_embed": g("encoder.embed_positions.weight"),
        "conv1": {"w": _np(sd[prefix + "encoder.conv1.weight"]
                           ).transpose(2, 1, 0),
                  "b": g("encoder.conv1.bias")},
        "conv2": {"w": _np(sd[prefix + "encoder.conv2.weight"]
                           ).transpose(2, 1, 0),
                  "b": g("encoder.conv2.bias")},
        "ln_post": {"g": g("encoder.layer_norm.weight"),
                    "b": g("encoder.layer_norm.bias")},
        "blocks": {
            "attn_ln": ln_stack("encoder", "self_attn_layer_norm", La),
            "attn": attn_stack("encoder", "self_attn", La),
            "mlp_ln": ln_stack("encoder", "final_layer_norm", La),
            "mlp": mlp_stack("encoder", La),
        },
    }

    decoder = {
        "pos_embed": g("decoder.embed_positions.weight"),
        "token_embed": g("decoder.embed_tokens.weight"),
        "ln": {"g": g("decoder.layer_norm.weight"),
               "b": g("decoder.layer_norm.bias")},
        "blocks": {
            "attn_ln": ln_stack("decoder", "self_attn_layer_norm", Lt),
            "attn": attn_stack("decoder", "self_attn", Lt),
            "cross_attn_ln": ln_stack("decoder", "encoder_attn_layer_norm", Lt),
            "cross_attn": attn_stack("decoder", "encoder_attn", Lt),
            "mlp_ln": ln_stack("decoder", "final_layer_norm", Lt),
            "mlp": mlp_stack("decoder", Lt),
        },
    }

    params = cast_params({"encoder": encoder, "decoder": decoder},
                         compute_dtype)
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_hf_checkpoint(path_or_repo: str, *, compute_dtype=jnp.bfloat16):
    """Load an HF Whisper checkpoint from a local directory (safetensors or
    pytorch_model.bin).  Returns (config, params).

    Network fetching is intentionally not attempted here; point this at a
    locally downloaded snapshot.
    """
    import os

    cfg_json = os.path.join(path_or_repo, "config.json")
    if not os.path.exists(cfg_json):
        raise FileNotFoundError(
            f"{path_or_repo} is not a local HF checkpoint directory")

    import json
    with open(cfg_json) as f:
        hf = json.load(f)

    config = config_from_hparams(
        n_vocab=hf["vocab_size"],
        n_audio_ctx=hf["max_source_positions"],
        n_audio_state=hf["d_model"],
        n_audio_head=hf["encoder_attention_heads"],
        n_audio_layer=hf["encoder_layers"],
        n_text_ctx=hf["max_target_positions"],
        n_text_state=hf["d_model"],
        n_text_head=hf["decoder_attention_heads"],
        n_text_layer=hf["decoder_layers"],
        n_mels=hf["num_mel_bins"],
    )

    st_path = os.path.join(path_or_repo, "model.safetensors")
    pt_path = os.path.join(path_or_repo, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file
        sd = load_file(st_path)
    elif os.path.exists(pt_path):
        import torch
        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(f"no weights found under {path_or_repo}")

    return config, params_from_hf_state_dict(sd, config,
                                             compute_dtype=compute_dtype)
