from .quant_linear import (
    DenseLinear,
    PackedLinear,
    ShardedPackedLinear,
    dequantize_weight,
    pack_linear,
    shard_packed_rowwise,
)

# generate/checkpoint depend on models (which depends on quant_linear above);
# import them lazily to break the cycle.
_LAZY = {
    "benchmark_decode": "generate", "decode_step": "generate",
    "generate": "generate", "prefill": "generate",
    "load_checkpoint": "checkpoint", "pack_model": "checkpoint",
    "save_checkpoint": "checkpoint",
    "generate_speculative": "speculative", "propose_ngram": "speculative",
    "stream_speculative": "speculative",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(f".{_LAZY[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(name)
