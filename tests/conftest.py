"""Test config: force CPU with 8 virtual devices so sharding tests run anywhere.

Mirrors SURVEY.md §4: multi-chip correctness is validated on an emulated mesh
(xla_force_host_platform_device_count=8), compared against the single-device
render. Note: this environment pre-imports jax at interpreter startup (axon
sitecustomize), so the platform must be switched via jax.config.update, not
env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from gltf_renderer_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
