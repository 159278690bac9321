"""Force tests onto a virtual 8-device CPU mesh (the standard fake-multi-chip
trick) with float64 enabled for finite-difference oracles. TPU behavior is
covered by bench.py / the driver's dryrun, not the unit suite.

NOTE: the environment pre-sets JAX_PLATFORMS=axon (single-TPU tunnel); we must
hard-override, not setdefault, or every eager op crosses the network.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "true"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
