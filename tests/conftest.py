"""Test configuration: run on CPU with a virtual 8-device mesh so sharding
tests exercise real collectives without TPU hardware.

NOTE: the env vars alone are not enough under the axon TPU plugin, which
registers itself regardless; jax.config.update("jax_platforms", ...) wins.
"""

import os

# Unconditional: the ambient environment sets JAX_PLATFORMS=axon (the TPU
# tunnel), and merely discovering that plugin can ping the device — which
# faults any concurrently running TPU job (only one process may hold it).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
