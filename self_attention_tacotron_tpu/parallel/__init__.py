"""Device-mesh parallelism: pjit shardings over ICI (new TPU capability).

The reference is single-process single-device (SURVEY.md §2.3: no DP/TP/
PP/SP and no communication backend anywhere). Scaling here is therefore a
new capability, designed the TPU way: a ``jax.sharding.Mesh`` with a
``data`` axis (batch data-parallelism for training and batched synthesis)
and a ``model`` axis (tensor-parallel sharding of the large kernels),
letting XLA/GSPMD insert the collectives over ICI.
"""

from self_attention_tacotron_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_params",
    "param_sharding_rules",
]
