"""owq_tpu — TPU-native outlier-aware weight quantization framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of the OWQ
reference (xvyaward/owq): Hessian-guided GPTQ-style reconstruction with
FP16 weak-column preservation, packed 3/4-bit runtime with fused TPU
kernels, perplexity + zero-shot evaluation, and tensor-parallel serving
over JAX device meshes.

Top-level API (lazily imported; submodules stay importable directly):

    quantize_model, eval_ppl, generate, Engine, load_checkpoint, ...
"""

__version__ = "0.1.0"

_API = {
    "QuantSpec": "owq_tpu.core.quantizer",
    "gptq_quantize": "owq_tpu.recon.gptq",
    "quantize_model": "owq_tpu.recon.pipeline",
    "forward": "owq_tpu.models.transformer",
    "import_hf_model": "owq_tpu.models.hf_import",
    "load_hf_pretrained": "owq_tpu.models.hf_import",
    "build_synthetic": "owq_tpu.models.synthetic",
    "synthetic_config": "owq_tpu.models.synthetic",
    "PackedLinear": "owq_tpu.runtime.quant_linear",
    "DenseLinear": "owq_tpu.runtime.quant_linear",
    "pack_model": "owq_tpu.runtime.checkpoint",
    "save_checkpoint": "owq_tpu.runtime.checkpoint",
    "load_checkpoint": "owq_tpu.runtime.checkpoint",
    "generate": "owq_tpu.runtime.generate",
    "benchmark_decode": "owq_tpu.runtime.generate",
    "Engine": "owq_tpu.runtime.batching",
    "fuse_block_projections": "owq_tpu.runtime.fuse",
    "eval_ppl": "owq_tpu.eval.ppl",
    "simple_evaluate": "owq_tpu.eval.harness.evaluator",
    "make_mesh": "owq_tpu.parallel.mesh",
    "shard_model_tp": "owq_tpu.parallel.partition",
}


def __getattr__(name):
    if name in _API:
        import importlib

        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module 'owq_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_API))
