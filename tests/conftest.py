"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests use
XLA's host-platform device emulation instead (SURVEY.md §4 test strategy).
Must set the env vars before jax is first imported.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob works.
# COSYPOSE_TPU_TESTS=1 opts into the real accelerator for the gated tests that
# need one (e.g. test_refiner_can_beat_identity_floor, which is impractical to
# compile+train on CPU) — use it TARGETED on those tests; the virtual-8-device
# mesh tests assume the CPU platform.
if os.environ.get("COSYPOSE_TPU_TESTS", "") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
