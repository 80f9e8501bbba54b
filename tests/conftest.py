"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's mpirun=1/2 golden-output mechanism
(reference: test/CMakeLists.txt, test/test_dummy.mpirun=*.output) by
making multi-device sharding testable without TPU hardware.

Note: in this environment the experimental 'axon' TPU plugin ignores
JAX_PLATFORMS, so we set both the legacy JAX_PLATFORM_NAME env var and
the jax_platforms config to reliably pin tests to host CPU.
"""

import os

# Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Double precision on CPU for tight numerical checks; the TPU path runs
# float32/bfloat16 (configured via Numerics.dtype).
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
