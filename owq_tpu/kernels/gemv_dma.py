"""Manually pipelined quantized matvec: explicit double-buffered DMA.

Alternative to the auto-pipelined grid kernel (gemv.py): one program
instance owns the whole output; qweight stays in HBM and streams through a
two-slot VMEM buffer with make_async_copy, overlapping each tile's
unpack+dot with the next tile's DMA (pallas_guide.md double-buffering
pattern).  Gated behind OWQ_GEMV_DMA=1 for e2e A/B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.packing import plane_offset, values_per_word

__all__ = ["packed_matvec_dma"]


def _dma_kernel(x_ref, q_hbm, o_ref, scratch, sems, *, bits: int, nw: int,
                to: int, n_tiles: int):
    v = values_per_word(bits)

    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(tile * to, to)],
            scratch.at[slot],
            sems.at[slot],
        )

    get_dma(0, 0).start()

    def body(tile, _):
        slot = tile % 2

        @pl.when(tile + 1 < n_tiles)
        def _():
            get_dma((tile + 1) % 2, tile + 1).start()

        get_dma(slot, tile).wait()
        q = scratch[slot]
        acc = None
        for p in range(v):
            plane = (jax.lax.shift_right_logical(q, plane_offset(bits, p))
                     & jnp.int32(7 if bits == 3 else 15)
                     ).astype(x_ref.dtype)
            part = jnp.dot(x_ref[:, p * nw:(p + 1) * nw], plane,
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        o_ref[:, pl.ds(tile * to, to)] = acc
        return ()

    jax.lax.fori_loop(0, n_tiles, body, ())


@functools.partial(jax.jit, static_argnames=("bits",))
def packed_matvec_dma(x: jnp.ndarray, qweight: jnp.ndarray, *, bits: int
                      ) -> jnp.ndarray:
    """x [rows<=8, in_pad] @ codes -> f32 [rows, out]; decode-oriented."""
    rows, in_pad = x.shape
    nw, out = qweight.shape
    to = 512 if out % 512 == 0 else (256 if out % 256 == 0 else out)
    n_tiles = out // to
    rows_pad = 8
    if rows < rows_pad:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))

    y = pl.pallas_call(
        functools.partial(_dma_kernel, bits=bits, nw=nw, to=to,
                          n_tiles=n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nw, to), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * in_pad * out,
            bytes_accessed=qweight.nbytes + x.nbytes + 4 * rows_pad * out,
            transcendentals=0),
    )(x, qweight)
    return y[:rows]
