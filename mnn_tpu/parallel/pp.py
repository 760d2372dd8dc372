"""Pipeline parallelism: layer stages sharded over a mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.11: its "Pipeline"
is a per-backend op list). TPU-native design: the stacked layer axis [L,...]
is sharded over the "pp" mesh axis, so each device HOLDS only L/S layers
(and the matching slice of the KV cache) — the memory-scaling property PP
exists for. Execution uses the SPMD broadcast-select schedule: at step i
every device applies its local layers to the current activation, and a
masked psum broadcasts stage i's (the only valid) output to all devices;
stage caches commit only on their own turn.

This is the correctness/memory-scaling formulation (each activation hop is
one psum over ICI); compute is S-fold redundant, so it trades FLOPs for
simplicity — micro-batched 1F1B-style scheduling is the optimization path,
not a different sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import Params, forward
from mnn_tpu.parallel.tp import param_specs as _tp_param_specs
from mnn_tpu.runtime.kvcache import KVCache


def _stage_specs(params: Params) -> Params:
    """Layers (and nothing else) sharded on the leading L axis over pp."""

    def layer_leaf_spec(a):
        return P(*(("pp",) + (None,) * (a.ndim - 1)))

    layers = jax.tree_util.tree_map(layer_leaf_spec, params.layers)
    return dataclasses.replace(
        jax.tree_util.tree_map(lambda a: P(*((None,) * a.ndim)), params),
        layers=layers,
    )


def cache_specs_pp(quantized: bool, bits: int = 8,
                   codebook: bool = False) -> KVCache:
    data = P("pp", None, None, None, None)
    scale = P("pp", None, None, None) if quantized else None
    return KVCache(k=data, v=data, k_scale=scale, v_scale=scale,
                   length=P(None), bits=bits if quantized else 16,
                   codebook=codebook and quantized)


def make_pp_forward(config: ModelConfig, mesh: Mesh, quantized_kv: bool,
                    params: Params, kv_bits: int = 8):
    """(params, tokens, cache) -> (logits, cache), layers pp-sharded."""
    from jax import shard_map

    stages = mesh.shape["pp"]
    if config.num_layers % stages:
        raise ValueError(f"pp={stages} must divide layers {config.num_layers}")
    local_cfg = dataclasses.replace(
        config, num_layers=config.num_layers // stages
    )
    pspecs = _stage_specs(params)
    cspecs = cache_specs_pp(quantized_kv, kv_bits if quantized_kv else 16)

    def local_fwd(p, tokens, cache):
        s = jax.lax.axis_index("pp")
        x = p.embedding[tokens]
        len0 = cache.length
        for i in range(stages):
            mine = (s == i)
            try:
                x_in = jax.lax.pcast(x, ("pp",), to="varying")
            except (AttributeError, TypeError):
                x_in = jax.lax.pvary(x, ("pp",))
            h, new_cache = forward(
                p, local_cfg, tokens, cache, inputs_embeds=x_in,
                return_hidden=True,
            )
            # broadcast stage i's output; commit only stage i's cache
            x = jax.lax.psum(
                jnp.where(mine, h.astype(jnp.float32), 0.0), "pp"
            ).astype(h.dtype)
            cache = jax.tree_util.tree_map(
                lambda new, old: jnp.where(mine, new, old), new_cache, cache
            )
        # lengths advance identically on every stage: recompute invariantly
        t = tokens.shape[1]
        cache = dataclasses.replace(
            cache, length=jnp.minimum(len0 + t, cache.capacity)
        )
        # head is replicated; compute logits from the final hidden state
        from mnn_tpu.models.layers import rms_norm
        from mnn_tpu.quant.quantize import QuantizedLinear

        xh = rms_norm(x[:, -1], p.final_norm, config.rms_norm_eps)
        if isinstance(p.lm_head, QuantizedLinear):
            from mnn_tpu.kernels.dequant_matmul import dequant_matmul

            logits = dequant_matmul(xh, p.lm_head, out_dtype=jnp.float32)
        else:
            head = p.embedding.T if p.lm_head is None else p.lm_head
            logits = jnp.dot(
                xh.astype(jnp.bfloat16), head.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return logits, cache

    fwd = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(pspecs, P(None, None), cspecs),
        out_specs=(P(None, None), cspecs),
    )
    return jax.jit(fwd)


def shard_params_pp(params: Params, mesh: Mesh) -> Params:
    specs = _stage_specs(params)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), params, specs
    )


def shard_cache_pp(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = cache_specs_pp(cache.quantized, cache.bits)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), cache, specs
    )
