"""Teacher-forced training / fine-tuning step.

The reference is inference-only; this module adds the capability the
functional design gives for free: a jittable, shardable training step
(cross-entropy of the decoder over teacher-forced tokens) for fine-tuning
Whisper checkpoints on TPU meshes.  Also serves as the multi-chip dry-run
workload (see /root/repo/__graft_entry__.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .config import WhisperConfig
from .model import (CrossKV, cross_kv, decoder_dense, encoder_forward,
                    init_kv_cache)

Params = Dict[str, Any]


def loss_fn(params: Params, config: WhisperConfig,
            mel: jax.Array,       # (B, 2*n_ctx, n_mels) f32
            tokens: jax.Array,    # (B, T) i32 — input tokens
            targets: jax.Array,   # (B, T) i32 — next-token labels
            mask: jax.Array,      # (B, T) f32 — loss weights
            audio_ctx: int = 0) -> jax.Array:
    """Mean masked cross-entropy of the decoder given encoded audio."""
    B, T = tokens.shape
    enc = encoder_forward(params, config, mel, audio_ctx=audio_ctx or None)
    xkv = cross_kv(params, config, enc)
    kv = init_kv_cache(config, B, dtype=params["decoder"]["token_embed"].dtype)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = decoder_dense(params, config, tokens, positions, kv, xkv,
                              n_valid=T)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def init_train_state(params: Params, lr: float = 1e-4) -> TrainState:
    opt = make_optimizer(lr)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.int32(0))


def train_step(state: TrainState, config: WhisperConfig, batch: Dict,
               lr: float = 1e-4) -> Tuple[TrainState, jax.Array]:
    """One full training step: forward, backward, optimizer update.

    jit/pjit-friendly: shard ``batch`` over "dp" and params over "tp" and
    XLA emits the gradient psum over the mesh.
    """
    opt = make_optimizer(lr)

    def loss(p):
        return loss_fn(p, config, batch["mel"], batch["tokens"],
                       batch["targets"], batch["mask"])

    lval, grads = jax.value_and_grad(loss)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, opt_state=opt_state,
                      step=state.step + 1), lval
