"""mnn_tpu — a TPU-native inference + serving framework.

A ground-up JAX/XLA/Pallas re-design with the capability surface of
alibaba/MNN (inference engine + MNN-LLM runtime): weight-only INT4/INT8
with per-block scales, fused dequant-matmul Pallas kernels, flash
attention with quantized KV-cache, prefill/decode LLM runtime with
sampling + speculative decoding, HF checkpoint export/quantization, and
multi-chip sharding over a `jax.sharding.Mesh` (the distributed layer the
single-device reference lacks).

Layer map (mirrors reference layers, re-architected for TPU — see SURVEY.md):
  quant/     quantized tensor formats           (≈ reference IDSTQuan / ConvolutionCommon)
  kernels/   Pallas MXU kernels                 (≈ reference NEON/SME asm + .cl/.metal kernels)
  ops/       jax op library + graph executor    (≈ reference geometry/shape + Session/Pipeline)
  models/    LLM model definitions + loaders    (≈ reference transformers/llm export mappings)
  runtime/   KV cache, sampling, generation     (≈ reference transformers/llm/engine)
  parallel/  mesh + sharding plans              (new: reference is single-device)
  convert/   HF -> quantized checkpoint tool    (≈ reference llmexport.py / MNNConvert)
  serve/     OpenAI-compatible server, batching (≈ reference mls_server.cpp, new scheduler)
"""

__version__ = "0.1.0"
