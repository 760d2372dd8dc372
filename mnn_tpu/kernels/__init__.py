from mnn_tpu.kernels.dequant_matmul import dequant_matmul

__all__ = ["dequant_matmul"]
