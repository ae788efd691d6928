"""owq_tpu — TPU-native outlier-aware weight quantization framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of the OWQ
reference (xvyaward/owq): Hessian-guided GPTQ-style reconstruction with
FP16 weak-column preservation, packed 3/4-bit runtime with fused TPU
kernels, perplexity + zero-shot evaluation, and tensor-parallel serving
over JAX device meshes.
"""

__version__ = "0.1.0"
