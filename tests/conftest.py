"""Test configuration: force an 8-device virtual CPU platform.

Tests exercise multi-chip sharding on a host-emulated mesh (the driver
separately dry-run-compiles the multi-chip path); the real TPU is reserved
for benchmarks.

Note: the environment's sitecustomize imports jax at interpreter startup, so
platform selection must go through jax.config (env vars are latched too
early).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# float64 available for high-precision parity tests (f32 remains default)
jax.config.update("jax_enable_x64", True)
