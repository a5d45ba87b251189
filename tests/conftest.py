"""Test config: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's single-machine multi-rank testing gap (SURVEY.md §4):
we use XLA's host-platform device virtualization as the JAX analog of gloo.
Must be set before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
