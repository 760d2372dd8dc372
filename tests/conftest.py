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
    flags += " --xla_force_host_platform_device_count=8"
# Deterministic bf16 rounding: XLA's excess-precision optimization elides
# internal f32->bf16->f32 round-trips when the bf16 value is not a program
# output, so the SAME eager math produces different results depending on
# what is returned — which breaks exact-parity oracles (megakernel vs
# per-layer must match bit-near; the rounding points are the contract).
if "xla_allow_excess_precision" not in flags:
    flags += " --xla_allow_excess_precision=false"
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
