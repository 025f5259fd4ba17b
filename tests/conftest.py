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
#
# GVI_DEVICE_TESTS=1 keeps the process on the real device (f32) so the
# tests/device/ regression gates run compiled:
#     GVI_DEVICE_TESTS=1 python -m pytest tests/device/ -q -n 0
# (-n 0 overrides the addopts xdist workers: one process, one TPU-compile
# session warmup)
# Under the normal `pytest tests/` invocation those gates skip (backend is
# cpu here) and everything else runs the CPU/f64 golden-parity mode.
if os.environ.get("GVI_DEVICE_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
