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


def test_engine_attn_reference_semantics(rng):
    """engine_attn_reference (jnp twin of the experimental batched engine
    attention kernel, parked under tools/) == per-slot masked softmax
    oracle, incl. the empty slot, write-index clamp, and GQA head-major
    ctx layout."""
    import os
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from exp_attn_engine import engine_attn_reference

    L, B, S, Hkv, hd, rep = 2, 4, 16, 2, 128, 2
    Hq = rep * Hkv
    layer, scale = 1, hd ** -0.5
    mk = lambda *sh: jnp.asarray(  # noqa: E731
        rng.standard_normal(sh).astype(np.float32))
    ks, vs = mk(L, B, S, Hkv, hd), mk(L, B, S, Hkv, hd)
    q, kn, vn = mk(B, Hq, hd), mk(B, Hkv, hd), mk(B, Hkv, hd)
    pos = jnp.asarray([0, 5, S - 1, S + 3], jnp.int32)

    ctx, k2, v2 = engine_attn_reference(
        q.astype(jnp.bfloat16), kn.astype(jnp.bfloat16),
        vn.astype(jnp.bfloat16), ks.astype(jnp.bfloat16),
        vs.astype(jnp.bfloat16), pos, layer=layer, scale=scale, rep=rep)

    k2n = np.asarray(k2, np.float32)
    for b, p in enumerate([0, 5, S - 1, S - 1]):  # clamped write index
        np.testing.assert_allclose(
            k2n[layer, b, p],
            np.asarray(kn.astype(jnp.bfloat16), np.float32)[b], atol=1e-6)
    # oracle per slot/head
    ctxn = np.asarray(ctx, np.float32).reshape(B, Hq, hd)
    kf = np.asarray(k2, np.float32)[layer]
    vf = np.asarray(v2, np.float32)[layer]
    for b, p in enumerate([0, 5, S - 1, S - 1]):
        for h in range(Hq):
            g = h // rep  # head-major: h = g*rep + r shares kv group g
            s = kf[b, :p + 1, g] @ np.asarray(
                q.astype(jnp.bfloat16), np.float32)[b, h] * scale
            e = np.exp(s - s.max())
            want = (e / e.sum()) @ vf[b, :p + 1, g]
            np.testing.assert_allclose(ctxn[b, h], want, rtol=2e-2,
                                       atol=2e-2)
