import os

# Request a virtual 8-device CPU mesh before any backend initializes, so the
# sharding tests exercise multi-device paths without TPU hardware.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The sandbox's sitecustomize force-registers the axon TPU platform and pins
# jax_platforms before user code runs; flip it back to CPU for unit tests
# (f64 golden-parity checks need the CPU backend anyway).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
