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


def shard_batch(batch: dict, mesh: Mesh, pad_to_data_axis: bool = True) -> dict:
    """Device-put a host batch dict with batch-dim sharding over 'data'.

    When the batch size does not divide the data axis, the batch is PADDED
    up to the next multiple by repeating the last example, and the pad
    rows' ``target_lengths``/``source_lengths`` are zeroed so every loss
    term masks them out (losses are already length-masked) — data
    parallelism is preserved for uneven final batches. With
    ``pad_to_data_axis=False`` (or a batch smaller than the axis in an
    already-0-length-free dict) it falls back to replication.
    """
    data_size = mesh.shape.get("data", 1)
    arrays = {
        k: v
        for k, v in batch.items()
        if hasattr(v, "ndim") and v.dtype.kind not in ("U", "S", "O")
    }
    out = {k: v for k, v in batch.items() if k not in arrays}  # ids stay on host

    batch_dims = {v.shape[0] for v in arrays.values() if v.ndim >= 1}
    uniform = len(batch_dims) == 1
    b = batch_dims.pop() if uniform else None
    # pad only loss-maskable batches (they carry target_lengths); plain
    # dicts keep their size and fall back to replication below
    can_pad = uniform and pad_to_data_axis and "target_lengths" in arrays
    if can_pad and b % data_size != 0 and data_size > 1:
        pad = (-b) % data_size
        import warnings

        warnings.warn(
            f"batch of {b} does not divide the data axis ({data_size}); "
            f"padding {pad} masked rows to keep data parallelism",
            stacklevel=2,
        )
        padded = {}
        for k, v in arrays.items():
            tail = np.repeat(np.asarray(v)[-1:], pad, axis=0)
            if k == "target_lengths":
                tail = np.zeros_like(tail)   # losses mask these rows out
            elif k == "source_lengths":
                tail = np.ones_like(tail)    # keep encoder scans well-posed
            padded[k] = jnp_concat(v, tail)
        arrays = padded

    for key, value in arrays.items():
        if value.ndim >= 1 and value.shape[0] % data_size == 0:
            sharding = batch_sharding(mesh, value.ndim)
        else:
            if data_size > 1:
                import warnings

                warnings.warn(
                    f"replicating {key!r} (dim0={value.shape[:1]}) — batch does "
                    f"not divide the {data_size}-way data axis; this batch is "
                    "NOT data-parallel",
                    stacklevel=2,
                )
            sharding = replicated(mesh)
        out[key] = jax.device_put(value, sharding)
    return out


def jnp_concat(head, tail):
    return np.concatenate([np.asarray(head), tail], axis=0)


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
