"""Test configuration: force a virtual 8-device CPU platform.

Mirrors the reference's strategy of testing multi-chunk/stream behavior
with a capacity-1 reader (tests.rs:690-693): we test multi-device sharding
on a virtual CPU mesh and the device engine on the CPU backend; the real
TPU is exercised by bench.py and the driver's compile checks.

Note: this environment's sitecustomize registers the TPU PJRT plugin in
every Python process and force-sets jax_platforms to "axon,cpu",
overriding the JAX_PLATFORMS env var. Initializing that plugin takes a
process-exclusive tunnel lock, which serializes and can wedge concurrent
test runs, so we override the config back to pure CPU before any backend
is initialized.
"""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
