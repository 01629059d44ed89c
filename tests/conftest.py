"""Test configuration: force an 8-device virtual CPU platform so that
multi-chip sharding tests mirror the reference's mpiexec -np {2,8,12}
integration tests (reference: domain/test/integration_mpi/CMakeLists.txt)
without real TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
