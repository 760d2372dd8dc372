"""torch.fx -> JAX graph converter (generic-model frontend).

Equivalent of the reference's TorchScript converter frontend
(/root/reference/tools/converter/source/torch/): traces a torch.nn.Module
with torch.fx and lowers every node through an op table onto
mnn_tpu.ops.nn_ops / jnp — producing a pure jax function + pytree of
weights that jit-compiles for TPU. Covers the CNN/classic-vision op set
(conv/bn/pools/activations/linear/resize/elementwise), extensible via
`MODULE_LOWERING` / `FUNCTION_LOWERING` (the analog of the reference's
per-op converter registries, e.g. source/onnx/ ~160 op converters).

Weights are converted eagerly to jnp arrays; at conversion time BatchNorm
stays unfused (XLA folds it into the conv at compile time — the reference
needs an explicit MergeBNToConvolution pass, PostConverter.cpp).
"""

from __future__ import annotations

import operator
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.ops import nn_ops as N


def _np(t) -> jnp.ndarray:
    return jnp.asarray(t.detach().cpu().numpy())


# -- call_module lowering: torch module instance -> fn(params, x, ...) ------

def _lower_conv(mod, p, x):
    return N.conv2d(
        x, p["weight"], p.get("bias"), stride=mod.stride,
        padding=mod.padding if isinstance(mod.padding, (tuple, list)) else mod.padding,
        dilation=mod.dilation, groups=mod.groups,
    )


def _lower_bn(mod, p, x):
    return N.batch_norm(
        x, p["running_mean"], p["running_var"], p.get("weight"),
        p.get("bias"), eps=mod.eps,
    )


def _lower_linear(mod, p, x):
    return N.linear(x, p["weight"], p.get("bias"))


def _lower_ln(mod, p, x):
    return N.layer_norm(x, mod.normalized_shape, p.get("weight"),
                        p.get("bias"), eps=mod.eps)


def MODULE_LOWERING():
    import torch.nn as nn

    return {
        nn.Conv2d: _lower_conv,
        nn.BatchNorm2d: _lower_bn,
        nn.Linear: _lower_linear,
        nn.LayerNorm: _lower_ln,
        nn.ReLU: lambda m, p, x: jax.nn.relu(x),
        nn.ReLU6: lambda m, p, x: jnp.clip(x, 0, 6),
        nn.SiLU: lambda m, p, x: jax.nn.silu(x),
        nn.GELU: lambda m, p, x: jax.nn.gelu(
            x, approximate=(getattr(m, "approximate", "none") != "none")),
        nn.Sigmoid: lambda m, p, x: jax.nn.sigmoid(x),
        nn.Tanh: lambda m, p, x: jnp.tanh(x),
        nn.Hardswish: lambda m, p, x: jax.nn.hard_swish(x),
        nn.Hardsigmoid: lambda m, p, x: jax.nn.hard_sigmoid(x),
        nn.LeakyReLU: lambda m, p, x: jax.nn.leaky_relu(x, m.negative_slope),
        nn.MaxPool2d: lambda m, p, x: N.max_pool2d(
            x, m.kernel_size, m.stride, m.padding, m.ceil_mode),
        nn.AvgPool2d: lambda m, p, x: N.avg_pool2d(
            x, m.kernel_size, m.stride, m.padding),
        nn.AdaptiveAvgPool2d: lambda m, p, x: N.adaptive_avg_pool2d(
            x, m.output_size),
        nn.Flatten: lambda m, p, x: _flatten(x, m.start_dim, m.end_dim),
        nn.Dropout: lambda m, p, x: x,
        nn.Identity: lambda m, p, x: x,
        nn.Softmax: lambda m, p, x: jax.nn.softmax(x, axis=m.dim),
        nn.Embedding: lambda m, p, x: p["weight"][x],
        nn.Upsample: lambda m, p, x: _upsample(m, x),
    }


def _flatten(x, start_dim=0, end_dim=-1):
    shape = list(x.shape)
    nd = len(shape)
    s = start_dim % nd
    e = end_dim % nd
    newshape = shape[:s] + [int(np.prod(shape[s : e + 1]))] + shape[e + 1 :]
    return x.reshape(newshape)


def _upsample(m, x):
    if m.scale_factor is not None:
        sf = m.scale_factor if isinstance(m.scale_factor, (tuple, list)) else (
            m.scale_factor, m.scale_factor)
        size = (int(x.shape[2] * sf[0]), int(x.shape[3] * sf[1]))
    else:
        size = m.size
    if m.mode == "nearest":
        return N.resize_nearest(x, size)
    return N.resize_bilinear(x, size)


# -- call_function / call_method lowering -----------------------------------

def FUNCTION_LOWERING():
    import torch
    import torch.nn.functional as F

    def cat(tensors, dim=0):
        return jnp.concatenate(tensors, axis=dim)

    table: Dict[Any, Callable] = {
        operator.add: operator.add,
        operator.sub: operator.sub,
        operator.mul: operator.mul,
        operator.truediv: operator.truediv,
        operator.getitem: lambda x, idx: x[idx],
        operator.floordiv: operator.floordiv,
        torch.add: lambda a, b: a + b,
        torch.mul: lambda a, b: a * b,
        torch.sub: lambda a, b: a - b,
        torch.cat: cat,
        torch.flatten: _flatten,
        torch.relu: jax.nn.relu,
        torch.sigmoid: jax.nn.sigmoid,
        torch.tanh: jnp.tanh,
        torch.exp: jnp.exp,
        torch.mean: lambda x, dim=None, keepdim=False: jnp.mean(
            x, axis=dim, keepdims=keepdim),
        torch.permute: lambda x, dims: jnp.transpose(x, dims),
        torch.transpose: lambda x, a, b: jnp.swapaxes(x, a, b),
        torch.softmax: lambda x, dim: jax.nn.softmax(x, axis=dim),
        torch.matmul: jnp.matmul,
        F.relu: jax.nn.relu,
        F.relu6: lambda x: jnp.clip(x, 0, 6),
        F.silu: jax.nn.silu,
        F.gelu: lambda x, approximate="none": jax.nn.gelu(
            x, approximate=(approximate != "none")),
        F.hardswish: jax.nn.hard_swish,
        F.hardsigmoid: jax.nn.hard_sigmoid,
        F.softmax: lambda x, dim=-1: jax.nn.softmax(x, axis=dim),
        F.adaptive_avg_pool2d: N.adaptive_avg_pool2d,
        F.avg_pool2d: lambda x, kernel_size, stride=None, padding=0,
        ceil_mode=False, count_include_pad=True, divisor_override=None: (
            N.avg_pool2d(x, kernel_size, stride, padding, count_include_pad)
        ),
        F.max_pool2d: lambda x, kernel_size, stride=None, padding=0,
        dilation=1, ceil_mode=False, return_indices=False: (
            N.max_pool2d(x, kernel_size, stride, padding, ceil_mode)
        ),
        F.interpolate: lambda x, size=None, scale_factor=None, mode="nearest",
        align_corners=None: (
            N.resize_nearest(x, size) if mode == "nearest"
            else N.resize_bilinear(x, size)
        ),
        F.dropout: lambda x, p=0.5, training=False, inplace=False: x,
    }

    def conv2d_fn(x, weight, bias=None, stride=1, padding=0, dilation=1,
                  groups=1):
        return N.conv2d(x, weight, bias, stride, padding, dilation, groups)

    def linear_fn(x, weight, bias=None):
        return N.linear(x, weight, bias)

    def batch_norm_fn(x, running_mean, running_var, weight=None, bias=None,
                      training=False, momentum=0.1, eps=1e-5):
        return N.batch_norm(x, running_mean, running_var, weight, bias, eps)

    # bare-leaf traces call the functional forms directly
    for f in (F.conv2d, torch.conv2d):
        table[f] = conv2d_fn
    for f in (F.linear,):
        table[f] = linear_fn
    for f in (F.batch_norm,):
        table[f] = batch_norm_fn
    table[F.layer_norm] = lambda x, shape, weight=None, bias=None, eps=1e-5: (
        N.layer_norm(x, shape, weight, bias, eps)
    )
    return table


METHOD_LOWERING = {
    "view": lambda x, *shape: x.reshape(
        shape[0] if len(shape) == 1 and isinstance(shape[0], (tuple, list))
        else shape),
    "reshape": lambda x, *shape: x.reshape(
        shape[0] if len(shape) == 1 and isinstance(shape[0], (tuple, list))
        else shape),
    "flatten": _flatten,
    "permute": lambda x, *dims: jnp.transpose(
        x, dims[0] if len(dims) == 1 and isinstance(dims[0], (tuple, list))
        else dims),
    "transpose": lambda x, a, b: jnp.swapaxes(x, a, b),
    "contiguous": lambda x: x,
    "mean": lambda x, dim=None, keepdim=False: jnp.mean(
        x, axis=dim, keepdims=keepdim),
    "sum": lambda x, dim=None, keepdim=False: jnp.sum(
        x, axis=dim, keepdims=keepdim),
    "size": lambda x, dim=None: x.shape if dim is None else x.shape[dim],
    "squeeze": lambda x, dim=None: jnp.squeeze(x, axis=dim),
    "unsqueeze": lambda x, dim: jnp.expand_dims(x, dim),
    "chunk": lambda x, n, dim=0: tuple(jnp.split(x, n, axis=dim)),
    "add": lambda x, y: x + y,
    "mul": lambda x, y: x * y,
    "float": lambda x: x.astype(jnp.float32),
}


def convert_torch_module(mod, sample_inputs=None):
    """Trace `mod` (eval mode) and return (jax_fn, params).

    jax_fn(params, *inputs) reproduces mod(*inputs); params is a dict
    {module_path: {tensor_name: jnp array}} plus {"__attrs__": {...}}.
    """
    import torch
    import torch.fx as fx

    mod = mod.eval()
    gm = fx.symbolic_trace(mod)
    module_table = MODULE_LOWERING()
    fn_table = FUNCTION_LOWERING()

    # collect per-module tensors and free get_attr tensors
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    modules = dict(gm.named_modules())
    for name, sub in modules.items():
        tensors = {}
        for tname, t in list(sub.named_parameters(recurse=False)) + list(
            sub.named_buffers(recurse=False)
        ):
            tensors[tname] = _np(t)
        if tensors:
            params[name] = tensors

    attrs: Dict[str, jnp.ndarray] = {}
    for node in gm.graph.nodes:
        if node.op == "get_attr":
            t = gm
            for part in node.target.split("."):
                t = getattr(t, part)
            attrs[node.target] = _np(t)
    if attrs:
        params["__attrs__"] = attrs

    graph = gm.graph

    def jax_fn(params, *inputs):
        env: Dict[str, Any] = {}
        it = iter(inputs)

        def lookup(a):
            if isinstance(a, fx.Node):
                return env[a.name]
            if isinstance(a, (list, tuple)):
                return type(a)(lookup(x) for x in a)
            if isinstance(a, dict):
                return {k: lookup(v) for k, v in a.items()}
            return a

        for node in graph.nodes:
            if node.op == "placeholder":
                env[node.name] = next(it)
            elif node.op == "get_attr":
                env[node.name] = params["__attrs__"][node.target]
            elif node.op == "call_module":
                sub = modules[node.target]
                fn = module_table.get(type(sub))
                if fn is None:
                    raise NotImplementedError(
                        f"no lowering for module {type(sub).__name__} "
                        f"({node.target})"
                    )
                args = [lookup(a) for a in node.args]
                env[node.name] = fn(sub, params.get(node.target, {}), *args)
            elif node.op == "call_function":
                fn = fn_table.get(node.target)
                if fn is None:
                    raise NotImplementedError(
                        f"no lowering for function {node.target}"
                    )
                args = [lookup(a) for a in node.args]
                kwargs = {k: lookup(v) for k, v in node.kwargs.items()}
                env[node.name] = fn(*args, **kwargs)
            elif node.op == "call_method":
                fn = METHOD_LOWERING.get(node.target)
                if fn is None:
                    raise NotImplementedError(
                        f"no lowering for method .{node.target}()"
                    )
                args = [lookup(a) for a in node.args]
                kwargs = {k: lookup(v) for k, v in node.kwargs.items()}
                env[node.name] = fn(*args, **kwargs)
            elif node.op == "output":
                return lookup(node.args[0])
        raise RuntimeError("graph had no output node")

    return jax_fn, params
