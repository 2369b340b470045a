"""Test configuration: hermetic CPU backend with 8 virtual devices.

Tests never require the real TPU; multi-chip sharding tests run on a
virtual 8-device CPU mesh (SURVEY.md §4). Must run before jax imports.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize force-registers the 'axon' TPU plugin and
# overrides jax_platforms to "axon,cpu" — which makes every test process
# claim the single real TPU chip (and concurrent processes deadlock on it).
# Re-pin the already-imported config to cpu before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
