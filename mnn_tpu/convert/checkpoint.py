"""Quantized checkpoint format: safetensors + JSON sidecars.

TPU-native replacement for the reference's `.mnn` + `.mnn.weight` container
(FlatBuffers Net + IDSTQuan packed weights, /root/reference/schema/default/
CaffeOp.fbs:62-84 and transformers/README.md export outputs): here the
packed int4/int8 planes, per-block scales and biases are first-class named
tensors in one safetensors file, with `config.json` (architecture) and
`runtime.json` (RuntimeConfig) beside it. Tokenizer files are copied through
from the source model directory so a checkpoint dir is self-contained
(like the reference's tokenizer.mtok + llm_config.json bundle).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mnn_tpu.models.config import ModelConfig, RuntimeConfig
from mnn_tpu.models.decoder import LayerParams, Params
from mnn_tpu.quant.quantize import QuantizedLinear

_TOKENIZER_FILES = (
    "tokenizer.json", "tokenizer_config.json", "tokenizer.model",
    "special_tokens_map.json", "vocab.json", "merges.txt",
    "generation_config.json", "chat_template.jinja",
)


def _flatten(params: Params) -> Tuple[dict, dict]:
    """-> (tensors {name: np.ndarray}, meta {name: (bits, block_size)})."""
    tensors, meta = {}, {}

    def put(prefix, val):
        if val is None:
            return
        if isinstance(val, QuantizedLinear):
            meta[prefix] = {"bits": val.bits, "block_size": val.block_size,
                            "act_bits": val.act_bits}
            put(prefix + ".packed", val.packed)
            put(prefix + ".scale", val.scale)
            put(prefix + ".bias", val.bias)
            put(prefix + ".out_bias", val.out_bias)
        else:
            tensors[prefix] = np.asarray(val)

    put("embedding", params.embedding)
    put("final_norm", params.final_norm)
    put("lm_head", params.lm_head)
    lp = params.layers
    for f in dataclasses.fields(lp):
        put(f"layers.{f.name}", getattr(lp, f.name))
    return tensors, meta


def save_checkpoint(
    out_dir: str,
    config: ModelConfig,
    params: Params,
    rt: Optional[RuntimeConfig] = None,
    tokenizer_src: Optional[str] = None,
) -> None:
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    tensors, meta = _flatten(params)
    # bf16 -> save as uint16 view (safetensors numpy has no bf16)
    casts = {}
    for k, v in list(tensors.items()):
        if v.dtype == jnp.bfloat16:
            tensors[k] = v.view(np.uint16)
            casts[k] = "bfloat16"
    save_file(
        tensors, os.path.join(out_dir, "model.safetensors"),
        metadata={"quant": json.dumps(meta), "casts": json.dumps(casts)},
    )
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({"mnn_tpu": True, **dataclasses.asdict(config)}, f, indent=1)
    with open(os.path.join(out_dir, "runtime.json"), "w") as f:
        json.dump(dataclasses.asdict(rt or RuntimeConfig()), f, indent=1)
    if tokenizer_src:
        for name in _TOKENIZER_FILES:
            src = os.path.join(tokenizer_src, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, name))


def load_checkpoint(model_dir: str):
    """-> (ModelConfig, Params, RuntimeConfig)."""
    from safetensors import safe_open

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg_d = json.load(f)
    cfg_d.pop("mnn_tpu", None)
    for k in ("rope_scaling", "mrope_section"):  # JSON lists -> hashable
        if isinstance(cfg_d.get(k), list):
            cfg_d[k] = tuple(cfg_d[k])
    config = ModelConfig(**cfg_d)
    rt_path = os.path.join(model_dir, "runtime.json")
    rt = RuntimeConfig.from_json(rt_path) if os.path.exists(rt_path) else RuntimeConfig()

    path = os.path.join(model_dir, "model.safetensors")
    tensors = {}

    from mnn_tpu.utils import native

    if native.available():
        # mmap reader (C++): header parse in native code, tensor() views the
        # page cache. Device uploads are async, so copy each view once
        # (host memcpy) before the file is unmapped.
        with native.StFile(path) as f:
            sf_meta = f.metadata()
            quant_meta = json.loads(sf_meta.get("quant", "{}"))
            casts = json.loads(sf_meta.get("casts", "{}"))
            for k in f.names:
                v = np.array(f.tensor(k))  # own the bytes before munmap
                if casts.get(k) == "bfloat16":
                    v = jnp.asarray(v.view(np.uint16)).view(jnp.bfloat16)
                tensors[k] = jnp.asarray(v)
    else:
        with safe_open(path, framework="numpy") as f:
            sf_meta = f.metadata() or {}
            quant_meta = json.loads(sf_meta.get("quant", "{}"))
            casts = json.loads(sf_meta.get("casts", "{}"))
            for k in f.keys():
                v = f.get_tensor(k)
                if casts.get(k) == "bfloat16":
                    v = jnp.asarray(v.view(np.uint16)).view(jnp.bfloat16)
                tensors[k] = jnp.asarray(v)

    def get_ql(prefix):
        m = quant_meta[prefix]
        return QuantizedLinear(
            packed=tensors[prefix + ".packed"],
            scale=tensors[prefix + ".scale"],
            bias=tensors[prefix + ".bias"],
            out_bias=tensors.get(prefix + ".out_bias"),
            bits=m["bits"],
            block_size=m["block_size"],
            act_bits=m.get("act_bits", 16),
        )

    def opt_ql(prefix):
        return get_ql(prefix) if prefix in quant_meta else None

    layers = LayerParams(
        wqkv=get_ql("layers.wqkv"),
        wo=get_ql("layers.wo"),
        wgu=opt_ql("layers.wgu"),
        wdown=opt_ql("layers.wdown"),
        input_norm=tensors["layers.input_norm"],
        post_norm=tensors["layers.post_norm"],
        q_norm=tensors.get("layers.q_norm"),
        k_norm=tensors.get("layers.k_norm"),
        pre_ffn_norm=tensors.get("layers.pre_ffn_norm"),
        post_ffn_norm=tensors.get("layers.post_ffn_norm"),
        router=tensors.get("layers.router"),
        wgu_e=opt_ql("layers.wgu_e"),
        wdown_e=opt_ql("layers.wdown_e"),
        wgu_shared=opt_ql("layers.wgu_shared"),
        wdown_shared=opt_ql("layers.wdown_shared"),
        shared_gate=tensors.get("layers.shared_gate"),
    )
    params = Params(
        embedding=tensors["embedding"],
        final_norm=tensors["final_norm"],
        lm_head=opt_ql("lm_head") if "lm_head" in quant_meta
        else tensors.get("lm_head"),
        layers=layers,
    )
    return config, params, rt
