"""Test configuration: force an 8-virtual-device CPU mesh.

All tests run on the JAX CPU backend with 8 fake devices so that every
sharding / pjit / shard_map code path executes the same collective program
it would on an 8-chip TPU slice (SURVEY.md §4).

This must run before jax initializes its backends, hence env mutation at
import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A plugin may have imported jax before this conftest ran, in which case the
# env var above was read too late — force the platform on the live config
# (safe as long as no backend has been initialized yet).
import jax

jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: anything not explicitly marked ``slow`` is ``fast``.

    ``pytest -m fast`` is the sub-2-minute tier that still touches every
    module; ``pytest -m slow`` (or no ``-m``) adds the full-geometry
    oracles, CLI e2e runs, trainer epochs and multihost tests.
    """
    import pytest

    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)

