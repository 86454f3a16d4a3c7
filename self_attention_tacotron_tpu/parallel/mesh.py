"""Mesh construction and sharding rules (data-parallel + optional tensor-parallel).

Design per SURVEY.md §2.3: the models are 10–30M params, so the honest
strategy is batch data-parallelism over the ``data`` axis (training and
batched synthesis), with an optional ``model`` axis that shards the widest
kernels (embedding table, transformer FFN, frame projections) Megatron-
style. All communication is XLA-inserted collectives over ICI — there is
no hand-written collective in the compute path.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Sequence[int] = (),
    axis_names: Tuple[str, ...] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a Mesh; default puts every device on the ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if not mesh_shape:
        mesh_shape = (len(devices), 1)
    mesh_shape = tuple(mesh_shape)
    if len(mesh_shape) == 1:
        mesh_shape = (mesh_shape[0], 1)
    total = int(np.prod(mesh_shape))
    if total != len(devices):
        raise ValueError(
            f"mesh shape {mesh_shape} needs {total} devices, have {len(devices)}"
        )
    arr = np.asarray(devices).reshape(mesh_shape)
    return Mesh(arr, axis_names[: len(mesh_shape)])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch dict with batch-dim sharding over 'data'.

    Falls back to replication when the batch size does not divide the data
    axis (e.g. tiny test batches on a large mesh) — still correct, just
    not data-parallel.
    """
    data_size = mesh.shape.get("data", 1)
    out = {}
    for key, value in batch.items():
        if not hasattr(value, "ndim") or value.dtype.kind in ("U", "S", "O"):
            out[key] = value  # ids / strings stay on host
            continue
        if value.ndim >= 1 and value.shape[0] % data_size == 0:
            sharding = batch_sharding(mesh, value.ndim)
        else:
            sharding = replicated(mesh)
        out[key] = jax.device_put(value, sharding)
    return out


# --------------------------------------------------------------------------- #
# Tensor-parallel parameter rules (model axis)
# --------------------------------------------------------------------------- #

#: path-regex → PartitionSpec factory. First match wins; default replicate.
_TP_RULES = [
    # symbol/accent/speaker embedding tables: shard the embedding dim
    (re.compile(r"embedding/embedding$"), lambda nd: P(None, "model")),
    # transformer FFN: column-parallel then row-parallel (Megatron pattern)
    (re.compile(r"ffn1/kernel$"), lambda nd: P(None, "model")),
    (re.compile(r"ffn2/kernel$"), lambda nd: P("model", None)),
    # fused QKV: column-parallel (heads split across model axis)
    (re.compile(r"qkv/kernel$"), lambda nd: P(None, "model")),
    # wide output projections: column-parallel
    (re.compile(r"output_projection/kernel$"), lambda nd: P(None, "model")),
]


def param_sharding_rules(path: str, value, mesh: Mesh) -> NamedSharding:
    """PartitionSpec for one parameter; honors divisibility or replicates."""
    model_size = mesh.shape.get("model", 1)
    if model_size > 1:
        for pattern, spec_fn in _TP_RULES:
            if pattern.search(path):
                spec = spec_fn(value.ndim)
                # only shard when the sharded dim divides evenly
                ok = True
                for dim, axis in zip(value.shape, spec):
                    if axis == "model" and dim % model_size != 0:
                        ok = False
                if ok and len(spec) <= value.ndim:
                    full_spec = list(spec) + [None] * (value.ndim - len(spec))
                    return NamedSharding(mesh, P(*full_spec))
    return replicated(mesh)


def _flatten_paths(tree, prefix=""):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, value in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        out.append((name, value))
    return out


def shard_params(params, mesh: Mesh):
    """device_put a parameter pytree according to the TP rules."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    placed = []
    for path, value in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        placed.append(jax.device_put(value, param_sharding_rules(name, value, mesh)))
    return jax.tree_util.tree_unflatten(treedef, placed)
