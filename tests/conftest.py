"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's mpirun=1/2 golden-output mechanism
(reference: test/CMakeLists.txt, test/test_dummy.mpirun=*.output) by
making multi-device sharding testable without TPU hardware.
"""

import os

# Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Double precision on CPU for tight numerical checks; the TPU path runs
# float32/bfloat16 (configured via Numerics.dtype).
jax.config.update("jax_enable_x64", True)
