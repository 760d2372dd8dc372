"""Tensor/data-parallel execution over a jax.sharding.Mesh.

This is the distributed layer the single-device reference does not have
(SURVEY.md §2.11/§5.8: MNN has no NCCL/MPI, no DP/TP/PP — its "parallelism"
is intra-op threading). TPU-native design:

* mesh axes ("dp", "tp"): batch over dp, attention heads + MLP intermediate
  + vocab over tp — the Megatron cut, expressed with `shard_map` so the
  Pallas kernels run on local shards and XLA collectives (`psum`,
  `all_gather`) ride ICI;
* quantized weights shard along their OUTPUT axis with their per-block
  scales/biases on the same axis, so a shard is itself a valid
  QuantizedLinear (scales travel with their weights — the co-design called
  out in SURVEY.md §7 hard part #1);
* `wo`/`wdown` shard along the INPUT (contraction) axis; their per-block
  scale rows shard identically; the partial products are reduced with one
  psum each (2 collectives per layer).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import LayerParams, Params, forward
from mnn_tpu.quant.quantize import QuantizedLinear
from mnn_tpu.runtime.kvcache import KVCache


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    import numpy as np

    return Mesh(np.asarray(devices[:n]).reshape(dp, tp), ("dp", "tp"))


def _ql_spec(ql: QuantizedLinear, out_sharded: bool) -> QuantizedLinear:
    """PartitionSpecs for a stacked QuantizedLinear [L, K(/2), N].

    out_sharded: shard N (scales/bias/out_bias follow N).
    else: shard K (packed axis 1; scale/bias rows axis 1).
    Built with dataclasses.replace on the real object so the spec pytree
    carries identical static metadata (bits/block_size).
    """
    if out_sharded:
        return dataclasses.replace(
            ql, packed=P(None, None, "tp"), scale=P(None, None, "tp"),
            bias=P(None, None, "tp"),
            out_bias=None if ql.out_bias is None else P(None, "tp"),
        )
    return dataclasses.replace(
        ql, packed=P(None, "tp", None), scale=P(None, "tp", None),
        bias=P(None, "tp", None),
        out_bias=None if ql.out_bias is None else P(None),
    )


def param_specs(config: ModelConfig, params: Params) -> Params:
    """PartitionSpec pytree structurally identical to `params`."""
    lp = params.layers

    def _expert_spec(ql):
        """Shard the expert axis (axis 1 of [L, E, ...])."""
        if ql is None:
            return None
        return dataclasses.replace(
            ql, packed=P(None, "tp", None, None),
            scale=P(None, "tp", None, None), bias=P(None, "tp", None, None),
            out_bias=None,
        )

    def _replicated_ql(ql):
        if ql is None:
            return None
        return dataclasses.replace(
            ql, packed=P(None, None, None), scale=P(None, None, None),
            bias=P(None, None, None),
            out_bias=None if ql.out_bias is None else P(None, None),
        )

    layer = LayerParams(
        wqkv=_ql_spec(lp.wqkv, True),
        wo=_ql_spec(lp.wo, False),
        wgu=None if lp.wgu is None else _ql_spec(lp.wgu, True),
        wdown=None if lp.wdown is None else _ql_spec(lp.wdown, False),
        input_norm=P(None, None),
        post_norm=P(None, None),
        q_norm=P(None, None) if config.qk_norm else None,
        k_norm=P(None, None) if config.qk_norm else None,
        router=None if lp.router is None else P(None, None, None),
        wgu_e=_expert_spec(lp.wgu_e),
        wdown_e=_expert_spec(lp.wdown_e),
        wgu_shared=_replicated_ql(lp.wgu_shared),
        wdown_shared=_replicated_ql(lp.wdown_shared),
        shared_gate=None if lp.shared_gate is None else P(None, None),
    )
    if params.lm_head is None:
        head_spec = None
    elif isinstance(params.lm_head, QuantizedLinear):
        head_spec = dataclasses.replace(
            params.lm_head, packed=P(None, "tp"), scale=P(None, "tp"),
            bias=P(None, "tp"), out_bias=None,
        )
    else:
        head_spec = P(None, "tp")
    return Params(
        embedding=P(None, None),  # replicated (gather source)
        final_norm=P(None),
        lm_head=head_spec,
        layers=layer,
    )


def cache_specs(quantized: bool, bits: int = 8,
                codebook: bool = False) -> KVCache:
    """[L, B, Hkv, S, D]: batch over dp, kv heads over tp. The static
    codebook flag must match the cache's (treedefs compare metadata)."""
    data = P(None, "dp", "tp", None, None)
    scale = P(None, "dp", "tp", None) if quantized else None
    return KVCache(k=data, v=data, k_scale=scale, v_scale=scale,
                   length=P("dp"), bits=bits if quantized else 16,
                   codebook=codebook and quantized)


def local_config(config: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard architecture view (heads/intermediate/vocab divided by tp)."""
    if config.num_kv_heads % tp or config.num_heads % tp:
        raise ValueError(
            f"tp={tp} must divide heads {config.num_heads}/{config.num_kv_heads}"
        )
    if config.intermediate_size % tp:
        raise ValueError(f"tp={tp} must divide intermediate {config.intermediate_size}")
    if config.is_moe and config.num_experts % tp:
        raise ValueError(f"tp={tp} must divide num_experts {config.num_experts}")
    vocab = config.vocab_size
    if not config.tie_word_embeddings:
        if vocab % tp:
            raise ValueError(f"tp={tp} must divide vocab {vocab}")
    return dataclasses.replace(
        config,
        num_heads=config.num_heads // tp,
        num_kv_heads=config.num_kv_heads // tp,
        intermediate_size=config.intermediate_size // tp,
    )


def shard_params(params: Params, config: ModelConfig, mesh: Mesh) -> Params:
    """Place params on the mesh with the TP layout."""
    specs = param_specs(config, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = cache_specs(cache.quantized, cache.bits)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )


def make_sharded_forward(
    config: ModelConfig, mesh: Mesh, quantized_kv: bool, params: Params,
    kv_bits: int = 8,
):
    """Build a pjit-able TP+DP forward: (params, tokens, cache) -> (logits, cache)."""
    from jax import shard_map

    tp = mesh.shape["tp"]
    lc = local_config(config, tp)
    pspecs = param_specs(config, params)
    cspecs = cache_specs(quantized_kv, kv_bits if quantized_kv else 16)

    def local_fwd(params, tokens, cache):
        return forward(params, lc, tokens, cache, tp_axis="tp")

    fwd = shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspecs),
        out_specs=(P("dp", None), cspecs),
    )
    return jax.jit(fwd)
