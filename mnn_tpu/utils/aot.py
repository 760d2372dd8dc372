"""Ahead-of-time compile + executable export/load.

Equivalent of the reference's offline accelerator-graph compilation
(/root/reference/tools/cpp/MNN2QNNModel.cpp: compile the whole graph for
the NPU offline, ship the context binary, load it at startup via
EXTERNAL_NPU_FILE_DIR — SURVEY.md §2.6's "compile the whole graph"
pathway). TPU-native form: `jax.jit(...).lower().compile()` once,
serialize the XLA executable, and load it at serving startup — no
tracing or compilation on the serving host.

Complements the persistent compilation cache (utils/compile_cache.py):
the cache avoids recompiles transparently; AOT export makes the
compiled artifact an explicit, shippable file with zero first-request
compile cost.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Sequence

import jax


def export_compiled(fn: Callable, example_args: Sequence[Any], path: str,
                    **jit_kwargs) -> None:
    """Compile fn(*example_args) and write the executable to `path`.

    The artifact is device-kind specific (a v5e executable will not load
    on v5p), like the reference's per-SoC NPU context binaries.
    """
    from jax.experimental import serialize_executable as se

    compiled = jax.jit(fn, **jit_kwargs).lower(*example_args).compile()
    blob, in_tree, out_tree = se.serialize(compiled)
    devs = set()
    for shardings in compiled.input_shardings[0]:
        devs |= set(getattr(shardings, "device_set", ()))
    with open(path, "wb") as f:
        pickle.dump({"xla_executable": blob, "in_tree": in_tree,
                     "out_tree": out_tree,
                     "num_devices": max(len(devs), 1),
                     "device_kind": jax.devices()[0].device_kind}, f)


def load_compiled(path: str) -> Callable:
    """Load an exported executable; returns a callable taking the same
    argument structure the function was exported with."""
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as f:
        d = pickle.load(f)
    kind = jax.devices()[0].device_kind
    if d["device_kind"] != kind:
        raise ValueError(
            f"AOT artifact compiled for {d['device_kind']!r}, "
            f"this host has {kind!r} (recompile with export_compiled)")
    n = d.get("num_devices", 1)
    return se.deserialize_and_load(
        d["xla_executable"], d["in_tree"], d["out_tree"],
        execution_devices=jax.devices()[:n])
