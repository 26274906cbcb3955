"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env before jax is imported anywhere (SURVEY.md §4d: CPU-mesh
simulation substitutes for the reference's missing distributed-test story).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU plugin and
# rewrites jax_platforms to "axon,cpu" regardless of JAX_PLATFORMS — override
# at runtime (before any backend initializes) so tests really run on the
# virtual 8-device CPU mesh and never contend for the single TPU.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model-forward compiles dominate test wall
# time; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_kdpc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Debug safety net: production gathers clamp out-of-bounds indices
# (mode="clip", ops/gather.py). In the suite, use NaN fill instead so an
# invalid-index bug surfaces as non-finite outputs rather than silently
# clamping to the last row.
from kd_pointcloud_tpu.ops import gather as _gather  # noqa: E402

_gather.DEBUG_OOB_FILL = True


@pytest.fixture
def rng():
    return np.random.RandomState(0)
