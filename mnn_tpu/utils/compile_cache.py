"""Persistent compilation cache.

TPU analog of the reference's GPU tuning/program cache
(`Interpreter::setCacheFile` + `CLRuntime::onSetCache/onGetCache`,
/root/reference/include/MNN/Interpreter.hpp:189-205): XLA executables are
cached on disk so second processes skip the (~100 s for a 24-layer model)
compile.
"""

import os

_DEFAULT = os.path.expanduser("~/.cache/mnn_tpu/xla")


def enable(path: str = _DEFAULT) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
