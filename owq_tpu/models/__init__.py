from .config import ModelConfig, ArchSpec, ARCH_REGISTRY, arch_for_model, config_from_hf
from .transformer import (
    ExpertBank,
    KVCache,
    QuantKVCache,
    QUANTIZABLE,
    block_forward,
    embed,
    forward,
    init_cache,
    init_quant_cache,
    quantizable_names,
    unembed,
)
from .hf_import import import_hf_model, load_hf_pretrained, params_from_state_dict
