"""Test configuration: force JAX onto CPU with 8 virtual devices.

All unit tests run on CPU (deterministic, no TPU needed); sharding tests
exercise a virtual 8-device mesh via --xla_force_host_platform_device_count.
Must run before the first `import jax` anywhere in the test process.
"""

import os

# Force CPU even if the session environment points JAX at a TPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already (TPU plugin registration), in
# which case the env var above was read too late — override the config knob.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
