"""Kernel parity: fused Pallas path vs fake-quant reference.

The analogue of the reference's ``test_kernel.py::correctness()`` gate
(MSE(kernel, fake-quant fp simulation) < 1e-6, owq/kernel/test_kernel.py:131).
Runs in interpreter mode on CPU; the same code path compiles via Mosaic on
a real TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from owq_tpu.core import QuantSpec, find_params
from owq_tpu.kernels.gemv import quant_matmul
from owq_tpu.runtime.quant_linear import pack_linear


def make_packed(rng, out, infeat, bits, n_out, with_bias=False):
    W = rng.standard_normal((out, infeat)).astype(np.float32) * 0.2
    spec = QuantSpec(bits, False)
    s, z = find_params(W, spec, mse=False)
    s, z = np.asarray(s), np.asarray(z)
    q = np.clip(np.round(W / s[:, None]) + z[:, None], 0, 2 ** bits - 1)
    Wfake = s[:, None] * (q - z[:, None])
    out_ids = np.sort(rng.choice(infeat, size=n_out, replace=False)).astype(np.int32)
    Wfake[:, out_ids] = W[:, out_ids]
    bias = rng.standard_normal(out).astype(np.float32) if with_bias else None
    p = pack_linear(Wfake, s, z, out_ids, bits, bias=bias,
                    weight_dtype=jnp.float32)
    return p, Wfake, bias


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.parametrize("shape", [(128, 256, 4), (128, 130, 2), (256, 640, 8)])
def test_kernel_matches_fake_quant(rng, bits, shape):
    out, infeat, n_out = shape
    p, Wfake, _ = make_packed(rng, out, infeat, bits, n_out)
    x = rng.standard_normal((3, infeat)).astype(np.float32)
    ref = x @ Wfake.T
    got = np.asarray(quant_matmul(p, jnp.asarray(x), interpret=True))
    mse = np.mean((got - ref) ** 2)
    assert mse < 1e-6, mse


def test_kernel_matches_xla_path(rng):
    out, infeat, n_out = 128, 250, 4
    p, _, _ = make_packed(rng, out, infeat, 3, n_out, with_bias=True)
    x = rng.standard_normal((5, infeat)).astype(np.float32)
    ref = np.asarray(p.apply(jnp.asarray(x), kernel="xla"))
    got = np.asarray(quant_matmul(p, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_kernel_decode_single_row(rng):
    """Matvec path (decode: one token)."""
    p, Wfake, bias = make_packed(rng, 256, 256, 3, 2, with_bias=True)
    x = rng.standard_normal((1, 256)).astype(np.float32)
    ref = x @ Wfake.T + bias
    got = np.asarray(quant_matmul(p, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_kernel_3d_input(rng):
    p, Wfake, _ = make_packed(rng, 128, 128, 4, 0)
    x = rng.standard_normal((2, 3, 128)).astype(np.float32)
    got = np.asarray(quant_matmul(p, jnp.asarray(x), interpret=True))
    assert got.shape == (2, 3, 128)
    np.testing.assert_allclose(got, x @ Wfake.T, atol=1e-5)


def test_kernel_output_width_not_tile_multiple(rng):
    """out widths no tile divides (synthetic 688-dim ffn) must be padded:
    a partial grid would leave the output tail unwritten (garbage under
    jit on hardware)."""
    out, infeat = 688, 256
    p, Wfake, _ = make_packed(rng, out, infeat, 3, 4)
    x = rng.standard_normal((9, infeat)).astype(np.float32)
    got = np.asarray(quant_matmul(p, jnp.asarray(x), interpret=True))
    assert got.shape == (9, out)
    np.testing.assert_allclose(got, x @ Wfake.T, atol=1e-4)
