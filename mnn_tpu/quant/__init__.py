from mnn_tpu.quant.quantize import (
    QuantizedLinear,
    dequantize,
    matmul_dequant_ref,
    pack_int4,
    quantize,
    quantize_activations_int8,
    unpack_int4,
)

__all__ = [
    "QuantizedLinear",
    "dequantize",
    "matmul_dequant_ref",
    "pack_int4",
    "quantize",
    "quantize_activations_int8",
    "unpack_int4",
]
