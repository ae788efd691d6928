from .quant_linear import DenseLinear, PackedLinear, pack_linear, dequantize_weight
