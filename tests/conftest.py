"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware by forcing the
host platform with 8 virtual devices (the driver's dryrun does the same).
Set FRIES_TPU_TEST_ON_TPU=1 to run the suite on real accelerators instead.

NOTE: the axon TPU plugin on this image overrides the JAX_PLATFORMS
environment variable, so the platform must be forced through jax.config
*before* any backend initialization.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# persistent compilation cache: amortizes XLA compiles across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

if not os.environ.get("FRIES_TPU_TEST_ON_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
