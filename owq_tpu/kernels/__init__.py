"""Pallas TPU kernels for the packed mixed-precision runtime.

Kernel inventory (the TPU-native equivalent of the reference's CUDA kernels,
owq/kernel/gemv.cu + dequant.cu — see SURVEY.md §2.4):

  * decode gemv: fused plane-unpack + dot + weak-column contribution
  * prefill dequant-matmul: tiled unpack feeding the MXU

``quant_matmul_pallas`` dispatches on input shape like the reference's
``set_kernel`` paths (owq/quant.py:379-480).
"""

from __future__ import annotations

import jax


def PALLAS_AVAILABLE() -> bool:
    """Pallas TPU kernels need a real TPU backend (Mosaic)."""
    try:
        import importlib.util

        if importlib.util.find_spec("owq_tpu.kernels.gemv") is None:
            return False
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


def quant_matmul_pallas(p, x, a8: bool = False):
    from .gemv import quant_matmul

    return quant_matmul(p, x, a8=a8)
