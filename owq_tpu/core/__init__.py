from .quantizer import (
    QuantSpec,
    fake_quant,
    find_params,
    find_params_minmax,
    find_params_mse,
    quantize_to_int,
    dequantize_int,
)
from .packing import (
    values_per_word,
    padded_infeatures,
    pack_int_weights,
    unpack_int_weights,
    pack_np,
    unpack_np,
)
