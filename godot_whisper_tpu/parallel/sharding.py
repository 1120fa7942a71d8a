"""Device-mesh sharding specs.

The scale-out design the reference lacks entirely (SURVEY.md §2e: no tensor
parallelism, no collectives — its only parallelism is host threads,
whisper.cpp:5817-5930).  Here:

- mesh axes ``("dp", "tp")``: utterance streams are data-parallel over
  ``dp`` (replacing whisper_full_parallel's thread-per-chunk with
  batch-per-chip), weights tensor-parallel over ``tp`` for models that
  exceed one chip's HBM (large-v3);
- TP follows the Megatron pattern: attention QKV and MLP up-projection
  sharded on the output feature axis, out-proj / down-projection sharded on
  the input axis so each block needs one reduce per sub-layer — XLA GSPMD
  inserts the psum over ICI;
- the token embedding shards on the FEATURE axis (the vocab sizes 51864/
  51865/51866 do not divide power-of-two tp): the logits contraction
  reduces over the sharded feature dim, so XLA emits one psum and logits
  come out replicated for the samplers.

All of this is annotation-only: the model code in models/model.py stays
unchanged, GSPMD does the partitioning.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import WhisperConfig


def make_mesh(dp: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    """Build a ("dp", "tp") mesh over the given (or all) devices."""
    devices = devices if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    dev = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(dev, axis_names=("dp", "tp"))


def _attn_pspecs() -> Dict[str, P]:
    return {
        "wq": P(None, None, "tp"), "bq": P(None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"), "bv": P(None, "tp"),
        "wo": P(None, "tp", None), "bo": P(None, None),
        # fused qkv of quantized decoders (models/quant._fuse_self_qkv):
        # out-axis column shard — each tp shard's columns are
        # independent, so the interleaved q|k|v grouping stays exact
        # (the q/k/v slices reshard via GSPMD where consumed)
        "wqkv": P(None, None, "tp"), "bqkv": P(None, "tp"),
    }


def _mlp_pspecs() -> Dict[str, P]:
    return {
        "w0": P(None, None, "tp"), "b0": P(None, "tp"),
        "w1": P(None, "tp", None), "b1": P(None, None),
    }


def _ln_pspecs() -> Dict[str, P]:
    return {"g": P(None, None), "b": P(None, None)}


def _quant_spec(qt, spec: P) -> Any:
    """Mirror a weight PartitionSpec onto a QuantTensor leaf: ``q`` keeps
    the weight spec; ``s`` drops the axis the scales were reduced over
    (the contraction axis), so a tp-sharded output axis stays tp-sharded
    on the scales."""
    from ..ops.qmatmul import QuantTensor, reduced_axis
    axis = reduced_axis(qt)
    padded = tuple(spec) + (None,) * (qt.q.ndim - len(tuple(spec)))
    s_spec = P(*(a for i, a in enumerate(padded) if i != axis))
    return QuantTensor(q=spec, s=s_spec)


def _quant4_spec(qt, spec: P, mesh: Optional[Mesh]) -> Any:
    """Mirror a weight PartitionSpec onto a Quant4Tensor leaf.

    Both ``q`` (..., S/2-packed, O) and ``s`` (..., S/groups, O) keep the
    logical weight's rank, so the weight spec applies verbatim to ``q``
    (nibble pairs never cross a group, so packed rows stay shard-local).
    For contraction-sharded weights (wo/w1: axis S on "tp") the scales are
    only tp-sharded when each shard holds WHOLE quantization groups
    (S/group divisible by the tp size); otherwise the group axis of ``s``
    is replicated — scales are tiny, so the cost is nil.
    """
    from ..ops.qmatmul import Quant4Tensor
    s_axes = list(tuple(spec) + (None,) * (qt.s.ndim - len(tuple(spec))))
    group_axis = qt.s.ndim - 2
    ax = s_axes[group_axis]
    if ax is not None and mesh is not None:
        n_shards = int(np.prod([mesh.shape[a] for a in
                                ((ax,) if isinstance(ax, str) else ax)]))
        if qt.s.shape[group_axis] % n_shards != 0:
            s_axes[group_axis] = None
    return Quant4Tensor(q=spec, s=P(*s_axes))


def quantize_pspecs(specs: Dict[str, Any], params,
                    mesh: Optional[Mesh] = None) -> Dict[str, Any]:
    """Rewrite a PartitionSpec pytree to mirror quantized params: every
    QuantTensor/Quant4Tensor leaf in ``params`` gets a matching pytree of
    specs."""
    from ..ops.qmatmul import QuantTensor, Quant4Tensor

    def walk(spec_node, param_node):
        if isinstance(param_node, QuantTensor):
            return _quant_spec(param_node, spec_node)
        if isinstance(param_node, Quant4Tensor):
            return _quant4_spec(param_node, spec_node, mesh)
        if isinstance(param_node, dict):
            return {k: walk(spec_node[k], v) for k, v in param_node.items()}
        return spec_node

    return walk(specs, params)


def param_pspecs(config: WhisperConfig) -> Dict[str, Any]:
    """PartitionSpec pytree matching models/params.py's layout."""
    enc_blocks = {
        "attn_ln": _ln_pspecs(), "attn": _attn_pspecs(),
        "mlp_ln": _ln_pspecs(), "mlp": _mlp_pspecs(),
    }
    dec_blocks = {
        "attn_ln": _ln_pspecs(), "attn": _attn_pspecs(),
        "cross_attn_ln": _ln_pspecs(), "cross_attn": _attn_pspecs(),
        "mlp_ln": _ln_pspecs(), "mlp": _mlp_pspecs(),
    }
    return {
        "encoder": {
            "pos_embed": P(None, None),
            "conv1": {"w": P(None, None, "tp"), "b": P("tp")},
            "conv2": {"w": P(None, None, "tp"), "b": P("tp")},
            "ln_post": {"g": P(None), "b": P(None)},
            "blocks": enc_blocks,
        },
        "decoder": {
            "pos_embed": P(None, None),
            "token_embed": P(None, "tp"),
            "ln": {"g": P(None), "b": P(None)},
            "blocks": dec_blocks,
        },
    }


def shard_params(params, mesh: Mesh, config: WhisperConfig):
    """Place a parameter pytree onto the mesh with TP shardings
    (int8/int4-quantized trees included — specs mirror Quant leaves)."""
    specs = quantize_pspecs(param_pspecs(config), params, mesh)

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for stream batches."""
    return NamedSharding(mesh, P("dp"))
