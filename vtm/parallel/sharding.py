"""Tensor-parallel parameter shardings (Megatron-style) for the ViT
block stack, expressed as PartitionSpecs and propagated by GSPMD.

The reference scales by data parallelism only (DDP); on TPU the natural
next axis is tensor parallelism over ICI: shard the attention heads and
the MLP hidden dimension across a ``model`` mesh axis. With the specs
below, XLA computes qkv/fc1 shard-local (column parallel), keeps
per-head attention local, and inserts ONE all-reduce after proj and one
after fc2 (row parallel) — the standard Megatron cut, derived entirely
from parameter shardings (no model-code changes; the scaling-book
recipe: annotate, let XLA insert collectives).

Spec rules by parameter path:
  qkv / query / key / value / fc1 / intermediate kernels -> (None, model)
  their biases                                           -> (model,)
  proj / attention_output / fc2 / output kernels         -> (model, None)
  everything else (embeds, norms, heads, cls, pos)       -> replicated
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel: output features sharded (bias sharded too)
_COL = ("qkv", "query", "key", "value", "fc1", "intermediate", "proj_q", "proj_kv")
# row-parallel: input features sharded, output all-reduced (bias replicated).
# (temporal_fc stays replicated: its input is already all-reduced, so a
# row cut would only add a reshard + all-reduce for nothing.)
_ROW = ("proj", "attention_output", "fc2", "output")


def _spec_for(path, leaf, model_axis: str) -> P:
    names = [str(getattr(k, "key", k)) for k in path]
    leafname = names[-1]
    module = names[-2] if len(names) >= 2 else ""
    if module in _COL:
        if leafname == "kernel" and leaf.ndim == 2:
            return P(None, model_axis)
        if leafname == "bias" and leaf.ndim == 1:
            return P(model_axis)
    if module in _ROW:
        if leafname == "kernel" and leaf.ndim == 2:
            return P(model_axis, None)
        # row-parallel bias is added AFTER the all-reduce: replicated
    return P()


def tp_param_specs(params, model_axis: str = "model"):
    """PartitionSpec pytree for a model's params under tensor parallelism."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = [_spec_for(path, leaf, model_axis) for path, leaf in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, specs)


def _default_specs(mesh: Mesh, params):
    """One source of truth for the default placement: tp cuts when the
    mesh has a 'model' axis, fully replicated otherwise — shard_params
    and the jit in_shardings must always agree."""
    if "model" in mesh.axis_names:
        return tp_param_specs(params)
    return jax.tree_util.tree_map(lambda _: P(), params)


def shard_params(mesh: Mesh, params, specs=None):
    """Place params on the mesh per ``specs`` (tp specs by default when
    the mesh has a 'model' axis, else fully replicated)."""
    if specs is None:
        specs = _default_specs(mesh, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def param_shardings(mesh: Mesh, params, specs=None):
    """NamedSharding pytree (for jit in_shardings) matching shard_params."""
    if specs is None:
        specs = _default_specs(mesh, params)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda s: isinstance(s, P))
