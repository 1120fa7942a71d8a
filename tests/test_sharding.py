"""Tensor/data-parallel sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import godot_whisper_tpu as gwt
from godot_whisper_tpu.models.model import (cross_kv, decoder_dense,
                                            encoder_forward, init_kv_cache)
from godot_whisper_tpu.models.params import init_params
from godot_whisper_tpu.parallel.sharding import (batch_sharding, make_mesh,
                                                 param_pspecs, shard_params)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def cfg():
    return gwt.get_config("tiny.en").replace(
        n_audio_layer=2, n_text_layer=2, n_audio_ctx=64, n_text_ctx=32,
        n_vocab=1024, n_audio_state=128, n_audio_head=4,
        n_text_state=128, n_text_head=4, name="nano")


@pytest.fixture(scope="module")
def unsharded(cfg):
    return init_params(cfg, seed=0, compute_dtype=jnp.float32)


def _forward(params, cfg, mel, tokens):
    enc = encoder_forward(params, cfg, mel)
    xkv = cross_kv(params, cfg, enc)
    B, T = tokens.shape
    kv = init_kv_cache(cfg, B, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = decoder_dense(params, cfg, tokens, positions, kv, xkv,
                              n_valid=T)
    return logits


def test_tp_sharded_matches_unsharded(cfg, unsharded, rng):
    """TP-sharded forward must equal the single-device forward."""
    mesh = make_mesh(dp=1, tp=4)
    sharded = shard_params(unsharded, mesh, cfg)

    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (2, 6)),
                         dtype=jnp.int32)

    want = np.asarray(_forward(unsharded, cfg, mel, tokens))
    fwd = jax.jit(lambda p, m, t: _forward(p, cfg, m, t))
    got = np.asarray(fwd(sharded, mel, tokens))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dp_batch_sharded(cfg, unsharded, rng):
    """dp-sharded batch forward runs and matches."""
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(unsharded, mesh, cfg)
    B = 4
    mel = jnp.asarray(rng.standard_normal(
        (B, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, 5)),
                         dtype=jnp.int32)
    mel_s = jax.device_put(mel, batch_sharding(mesh))
    tokens_s = jax.device_put(tokens, batch_sharding(mesh))

    want = np.asarray(_forward(unsharded, cfg, mel, tokens))
    fwd = jax.jit(lambda p, m, t: _forward(p, cfg, m, t))
    got = np.asarray(fwd(sharded, mel_s, tokens_s))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sharded_train_step(cfg, unsharded, rng):
    from godot_whisper_tpu.models.training import (init_train_state,
                                                   train_step)

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(unsharded, mesh, cfg)
    B, T = 4, 8
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (B, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32)),
        "tokens": jnp.asarray(rng.integers(0, cfg.n_vocab, (B, T)),
                              dtype=jnp.int32),
        "targets": jnp.asarray(rng.integers(0, cfg.n_vocab, (B, T)),
                               dtype=jnp.int32),
        "mask": jnp.ones((B, T), jnp.float32),
    }
    batch = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in batch.items()}
    state = init_train_state(sharded)
    step = jax.jit(lambda s, b: train_step(s, cfg, b))
    state, loss = step(state, batch)
    state, loss2 = step(state, batch)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss)  # learning on the same batch


def test_pspecs_cover_param_tree(cfg, unsharded):
    """Every leaf has a matching PartitionSpec of the right rank.  The
    spec tree may carry EXTRA keys that only exist in quantized trees
    (the fused wqkv/bqkv leaves) — quantize_pspecs prunes to the actual
    param structure."""
    specs = param_pspecs(cfg)
    flat_p = jax.tree_util.tree_leaves_with_path(unsharded)
    flat_s = jax.tree_util.tree_leaves_with_path(specs)
    paths_p = {jax.tree_util.keystr(k) for k, _ in flat_p}
    paths_s = {jax.tree_util.keystr(k) for k, _ in flat_s}
    assert paths_p <= paths_s, paths_p - paths_s
    extra = paths_s - paths_p
    assert all(("wqkv" in e or "bqkv" in e) for e in extra), extra
    spec_by_path = {jax.tree_util.keystr(k): v for k, v in flat_s}
    for k, leaf in flat_p:
        spec = spec_by_path[jax.tree_util.keystr(k)]
        assert len(spec) <= leaf.ndim, (k, spec, leaf.shape)


def test_pspecs_cover_quantized_fused_tree(cfg, unsharded):
    """The FUSED int8 tree (wqkv/bqkv replace self wq/wk/wv/bq/bv) gets
    an exactly-matching pruned spec tree."""
    from godot_whisper_tpu.models.quant import quantize_decoder_int8
    from godot_whisper_tpu.parallel.sharding import quantize_pspecs

    pq = quantize_decoder_int8(unsharded)
    specs = quantize_pspecs(param_pspecs(cfg), pq)
    flat_p = {jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(pq)}
    flat_s = {jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(specs)}
    assert flat_p == flat_s
