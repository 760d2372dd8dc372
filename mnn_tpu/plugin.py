"""Public custom-op (plugin) registration.

TPU-native analog of the reference's plugin system — user-registered
shape-inference + kernel for `OpType_Plugin`
(/root/reference/source/plugin/PluginKernel.cpp,
PluginShapeInference.cpp, demo under /root/reference/test/plugin/). On
TPU there is no separate shape-inference hook to write: the registered
converter returns a jax value (XLA abstract eval infers shapes), and the
"kernel" half is whatever the function calls — plain jax, or a custom
Pallas kernel for ops XLA fuses poorly (see docs/plugins.md for a
worked Pallas example).

Converter signature (matches the built-in tables):

    def my_op(ctx, node, *inputs):
        ...
        return output            # or a tuple for multi-output ops

`node` is the frontend's native node object (onnx NodeProto, TF NodeDef
dict, TFLite operator record, caffe layer); attribute access is
frontend-specific. Registrations apply process-wide, before conversion.
"""

from __future__ import annotations

from typing import Callable, Dict, List

_FRONTENDS = ("onnx", "tf", "tflite", "caffe")


def _table(frontend: str) -> Dict[str, Callable]:
    if frontend == "onnx":
        from mnn_tpu.convert import onnx_frontend as m
    elif frontend == "tf":
        from mnn_tpu.convert import tf_frontend as m
    elif frontend == "tflite":
        from mnn_tpu.convert import tflite_frontend as m
    elif frontend == "caffe":
        from mnn_tpu.convert import caffe_frontend as m

        return m._LAYERS
    else:
        raise ValueError(
            f"unknown frontend {frontend!r}; one of {_FRONTENDS}")
    return m._OPS


def register_op(op_type: str, fn: Callable, *, frontend: str = "onnx",
                override: bool = False) -> None:
    """Register `fn` as the converter for `op_type` in a frontend.

    By default refuses to shadow a built-in converter (pass
    `override=True` to replace one — e.g. to substitute a custom Pallas
    kernel for a built-in lowering).
    """
    table = _table(frontend)
    if op_type in table and not override:
        raise ValueError(
            f"{frontend} op {op_type!r} already registered; pass "
            "override=True to replace the built-in converter")
    table[op_type] = fn


def unregister_op(op_type: str, *, frontend: str = "onnx") -> None:
    _table(frontend).pop(op_type, None)


def registered_ops(frontend: str = "onnx") -> List[str]:
    """Sorted op names the frontend currently converts (built-in + plugins)."""
    return sorted(_table(frontend))
