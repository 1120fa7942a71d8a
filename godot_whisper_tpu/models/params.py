"""Parameter pytrees: layout, dtype policy, checkpoint conversion, random init.

TPU-first layout decisions (this is where we deliberately diverge from the
reference's per-layer tensor structs, whisper.cpp:553-637):

- Per-layer weights are STACKED along a leading layer axis so the transformer
  stack runs as one ``lax.scan`` — compile time stays flat for 32-layer
  models and XLA sees a single fused layer body.
- Matmul weights are stored ``(in, out)`` for ``x @ W`` (MXU-friendly,
  no transposes in the forward pass) and kept in bfloat16 by default.
- LayerNorm scales/biases, biases and positional embeddings stay float32
  (accuracy; they're elementwise and tiny).
- Conv stem kernels are ``(width, in, out)`` for
  ``lax.conv_general_dilated(..., dimension_numbers=("NWC","WIO","NWC"))``.

Checkpoint tensor names follow the ggml naming (whisper.cpp:1354-1510) so the
converter below is a direct table.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config import WhisperConfig
from .loader_ggml import RawCheckpoint

Params = Dict[str, Any]


def _t(x: np.ndarray) -> np.ndarray:
    """(out, in) torch/ggml orientation -> (in, out) for x @ W."""
    return np.ascontiguousarray(x.T)


def _attn_block_names(prefix: str) -> Dict[str, str]:
    return {
        "wq": f"{prefix}.query.weight", "bq": f"{prefix}.query.bias",
        "wk": f"{prefix}.key.weight",                      # K has no bias
        "wv": f"{prefix}.value.weight", "bv": f"{prefix}.value.bias",
        "wo": f"{prefix}.out.weight", "bo": f"{prefix}.out.bias",
    }


def params_from_raw(
    raw: RawCheckpoint,
    *,
    compute_dtype=jnp.bfloat16,
    to_device: bool = True,
) -> Params:
    """Convert a RawCheckpoint tensor dict into the framework pytree.

    Missing tensors (stub checkpoints) are zero-filled so the full pipeline
    still runs in CI — the decode loop detects ``n_loaded == 0`` upstream and
    short-circuits exactly like the reference (whisper.cpp:5492-5497).
    """
    c = raw.config
    t = raw.tensors
    S, V = c.n_audio_state, c.n_vocab
    M = c.n_mels

    def get(name: str, shape) -> np.ndarray:
        arr = t.get(name)
        if arr is None:
            return np.zeros(shape, dtype=np.float32)
        return arr.astype(np.float32)

    def stack(fmt: str, n_layer: int, shape, transform=None) -> np.ndarray:
        outs = []
        for i in range(n_layer):
            a = get(fmt.format(i), shape)
            outs.append(transform(a) if transform is not None else a)
        return np.stack(outs, axis=0)

    La, Lt = c.n_audio_layer, c.n_text_layer

    def attn_stack(prefix_fmt: str, n_layer: int) -> Dict[str, np.ndarray]:
        out = {}
        names = _attn_block_names("{p}")
        for key, suffix in names.items():
            full_fmt = prefix_fmt + suffix[3:]  # strip "{p}"
            if key.startswith("w"):
                out[key] = stack(full_fmt, n_layer, (S, S), _t)
            else:
                out[key] = stack(full_fmt, n_layer, (S,))
        return out

    encoder = {
        "pos_embed": get("encoder.positional_embedding", (c.n_audio_ctx, S)),
        "conv1": {
            "w": get("encoder.conv1.weight", (S, M, 3)).transpose(2, 1, 0),
            "b": get("encoder.conv1.bias", (S, 1)).reshape(S),
        },
        "conv2": {
            "w": get("encoder.conv2.weight", (S, S, 3)).transpose(2, 1, 0),
            "b": get("encoder.conv2.bias", (S, 1)).reshape(S),
        },
        "ln_post": {
            "g": get("encoder.ln_post.weight", (S,)),
            "b": get("encoder.ln_post.bias", (S,)),
        },
        "blocks": {
            "attn_ln": {
                "g": stack("encoder.blocks.{}.attn_ln.weight", La, (S,)),
                "b": stack("encoder.blocks.{}.attn_ln.bias", La, (S,)),
            },
            "attn": attn_stack("encoder.blocks.{}.attn", La),
            "mlp_ln": {
                "g": stack("encoder.blocks.{}.mlp_ln.weight", La, (S,)),
                "b": stack("encoder.blocks.{}.mlp_ln.bias", La, (S,)),
            },
            "mlp": {
                "w0": stack("encoder.blocks.{}.mlp.0.weight", La, (4 * S, S), _t),
                "b0": stack("encoder.blocks.{}.mlp.0.bias", La, (4 * S,)),
                "w1": stack("encoder.blocks.{}.mlp.2.weight", La, (S, 4 * S), _t),
                "b1": stack("encoder.blocks.{}.mlp.2.bias", La, (S,)),
            },
        },
    }

    decoder = {
        "pos_embed": get("decoder.positional_embedding", (c.n_text_ctx, S)),
        "token_embed": get("decoder.token_embedding.weight", (V, S)),
        "ln": {
            "g": get("decoder.ln.weight", (S,)),
            "b": get("decoder.ln.bias", (S,)),
        },
        "blocks": {
            "attn_ln": {
                "g": stack("decoder.blocks.{}.attn_ln.weight", Lt, (S,)),
                "b": stack("decoder.blocks.{}.attn_ln.bias", Lt, (S,)),
            },
            "attn": attn_stack("decoder.blocks.{}.attn", Lt),
            "cross_attn_ln": {
                "g": stack("decoder.blocks.{}.cross_attn_ln.weight", Lt, (S,)),
                "b": stack("decoder.blocks.{}.cross_attn_ln.bias", Lt, (S,)),
            },
            "cross_attn": attn_stack("decoder.blocks.{}.cross_attn", Lt),
            "mlp_ln": {
                "g": stack("decoder.blocks.{}.mlp_ln.weight", Lt, (S,)),
                "b": stack("decoder.blocks.{}.mlp_ln.bias", Lt, (S,)),
            },
            "mlp": {
                "w0": stack("decoder.blocks.{}.mlp.0.weight", Lt, (4 * S, S), _t),
                "b0": stack("decoder.blocks.{}.mlp.0.bias", Lt, (4 * S,)),
                "w1": stack("decoder.blocks.{}.mlp.2.weight", Lt, (S, 4 * S), _t),
                "b1": stack("decoder.blocks.{}.mlp.2.bias", Lt, (S,)),
            },
        },
    }

    params = {"encoder": encoder, "decoder": decoder}
    params = cast_params(params, compute_dtype)
    if to_device:
        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params


# Keys (leaf path suffixes) that stay in float32 under any compute dtype.
_F32_KEYS = {"g", "b", "bq", "bv", "bo", "b0", "b1", "pos_embed"}


def cast_params(params: Params, compute_dtype) -> Params:
    """Apply the dtype policy: matmul weights -> compute_dtype, everything
    elementwise (norms, biases, positional embeddings) -> float32."""

    def walk(tree, key=None):
        if isinstance(tree, dict):
            return {k: walk(v, k) for k, v in tree.items()}
        dt = np.float32 if key in _F32_KEYS else compute_dtype
        if isinstance(tree, np.ndarray):
            return tree.astype(dt)
        return tree.astype(dt)

    return walk(params)


def init_params(
    config: WhisperConfig,
    *,
    seed: int = 0,
    compute_dtype=jnp.bfloat16,
    scale: float = 0.02,
) -> Params:
    """Random-normal parameters with the production layout — used for benches
    and shape/parity tests (the reference has no equivalent; its tests rely on
    zero-weight stubs only)."""
    rng = np.random.default_rng(seed)
    c = config
    S, V, M = c.n_audio_state, c.n_vocab, c.n_mels
    La, Lt = c.n_audio_layer, c.n_text_layer

    def w(*shape):
        return rng.standard_normal(shape, dtype=np.float32) * scale

    def ones(*shape):
        return np.ones(shape, dtype=np.float32)

    def zeros(*shape):
        return np.zeros(shape, dtype=np.float32)

    def attn(L):
        return {"wq": w(L, S, S), "bq": zeros(L, S), "wk": w(L, S, S),
                "wv": w(L, S, S), "bv": zeros(L, S), "wo": w(L, S, S),
                "bo": zeros(L, S)}

    def blocks(L, cross: bool):
        b = {
            "attn_ln": {"g": ones(L, S), "b": zeros(L, S)},
            "attn": attn(L),
            "mlp_ln": {"g": ones(L, S), "b": zeros(L, S)},
            "mlp": {"w0": w(L, S, 4 * S), "b0": zeros(L, 4 * S),
                    "w1": w(L, 4 * S, S), "b1": zeros(L, S)},
        }
        if cross:
            b["cross_attn_ln"] = {"g": ones(L, S), "b": zeros(L, S)}
            b["cross_attn"] = attn(L)
        return b

    params = {
        "encoder": {
            "pos_embed": w(c.n_audio_ctx, S),
            "conv1": {"w": w(3, M, S), "b": zeros(S)},
            "conv2": {"w": w(3, S, S), "b": zeros(S)},
            "ln_post": {"g": ones(S), "b": zeros(S)},
            "blocks": blocks(La, cross=False),
        },
        "decoder": {
            "pos_embed": w(c.n_text_ctx, S),
            "token_embed": w(V, S),
            "ln": {"g": ones(S), "b": zeros(S)},
            "blocks": blocks(Lt, cross=True),
        },
    }
    params = cast_params(params, compute_dtype)
    return jax.tree_util.tree_map(jnp.asarray, params)


def init_params_device(config: WhisperConfig, *, seed: int = 0,
                       compute_dtype=jnp.bfloat16,
                       scale: float = 0.02) -> Params:
    """Random parameters generated ON the device (jax.random inside one
    jit) — no host->device weight transfer.  Used for benching large
    models on relay-tunneled runtimes where uploading gigabytes of
    random weights would dwarf the measurement (~30 MB/s links)."""
    c = config
    S, V, M = c.n_audio_state, c.n_vocab, c.n_mels
    La, Lt = c.n_audio_layer, c.n_text_layer

    def build(key):
        ctr = [key]

        def w(*shape):
            ctr[0], sub = jax.random.split(ctr[0])
            return (jax.random.normal(sub, shape, jnp.float32)
                    * scale).astype(compute_dtype)

        def ones(*shape):
            return jnp.ones(shape, jnp.float32)

        def zeros(*shape):
            return jnp.zeros(shape, jnp.float32)

        def attn(L):
            return {"wq": w(L, S, S), "bq": zeros(L, S), "wk": w(L, S, S),
                    "wv": w(L, S, S), "bv": zeros(L, S),
                    "wo": w(L, S, S), "bo": zeros(L, S)}

        def blocks(L, cross: bool):
            b = {
                "attn_ln": {"g": ones(L, S), "b": zeros(L, S)},
                "attn": attn(L),
                "mlp_ln": {"g": ones(L, S), "b": zeros(L, S)},
                "mlp": {"w0": w(L, S, 4 * S), "b0": zeros(L, 4 * S),
                        "w1": w(L, 4 * S, S), "b1": zeros(L, S)},
            }
            if cross:
                b["cross_attn_ln"] = {"g": ones(L, S), "b": zeros(L, S)}
                b["cross_attn"] = attn(L)
            return b

        return {
            "encoder": {
                "pos_embed": (jax.random.normal(
                    jax.random.fold_in(key, 1), (c.n_audio_ctx, S))
                    * scale).astype(jnp.float32),
                "conv1": {"w": w(3, M, S), "b": zeros(S)},
                "conv2": {"w": w(3, S, S), "b": zeros(S)},
                "ln_post": {"g": ones(S), "b": zeros(S)},
                "blocks": blocks(La, cross=False),
            },
            "decoder": {
                "pos_embed": (jax.random.normal(
                    jax.random.fold_in(key, 2), (c.n_text_ctx, S))
                    * scale).astype(jnp.float32),
                "token_embed": w(V, S),
                "ln": {"g": ones(S), "b": zeros(S)},
                "blocks": blocks(Lt, cross=True),
            },
        }

    return jax.jit(build)(jax.random.PRNGKey(seed))


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))
