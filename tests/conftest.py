"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's "one suite x backend matrix" strategy
(/root/reference/test/main.cpp runs ~350 tests against every backend):
the suite runs on the CPU backend with 8 virtual devices so sharding
tests exercise real collectives without TPU hardware; the same code
paths run on TPU in bench/serving.
"""

import os

# Force CPU even though the environment presets JAX_PLATFORMS=axon (the TPU
# tunnel): the suite must run hermetically on the virtual 8-device mesh.
# A pytest plugin imports jax before this conftest runs, so setting env vars
# alone is not enough — use jax.config (backends are still uninitialized).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
