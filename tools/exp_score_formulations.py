"""Isolated experiment: per-head attention score formulations on TPU.

Compares, at decode shapes [S, Hkv, hd] x per-head q [Hkv, hd]:
  A. elementwise mult + lane-dim sum (the current kernel formulation)
  B. batched dot_general over the head dim (MXU, batch=Hkv)
  C. bf16 mult + f32 lane sum (halve the convert traffic)
Run inside one pallas kernel each, scanned, to get clean per-call time.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools


def timed(fn, karg, qarg, n=200):
    out = fn(karg, qarg)
    jax.block_until_ready(out)

    @jax.jit
    def run(q0):
        def body(q, _):
            r = fn(karg, q)
            # fold the result back into q to defeat hoisting/CSE
            fb = jnp.sum(r, axis=tuple(range(r.ndim))) * 1e-12
            return (q + fb.astype(q.dtype) * 0).astype(q.dtype) + \
                   (fb.astype(q.dtype) * jnp.ones_like(q) * 1e-20), r[0, 0]
        qf, rs = jax.lax.scan(body, q0, None, length=n)
        return qf, rs

    r = run(qarg)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5):
        r = run(qarg)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / (5 * n)


def main():
    S, Hkv, hd = 512, 32, 128
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((S, Hkv, hd)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    kt = jnp.asarray(np.moveaxis(np.asarray(k, np.float32), 1, 0)
                     ).astype(jnp.bfloat16)          # [Hkv, S, hd]
    q = jnp.asarray(rng.standard_normal((Hkv, hd)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def kern_a(k_ref, q_ref, o_ref):
        kf = k_ref[:].astype(jnp.float32)
        qf = q_ref[:].astype(jnp.float32)
        o_ref[:] = jnp.sum(kf * qf[None], axis=-1)

    def kern_c(k_ref, q_ref, o_ref):
        prod = (k_ref[:] * q_ref[:][None]).astype(jnp.float32)
        o_ref[:] = jnp.sum(prod, axis=-1)

    def kern_b(k_ref, q_ref, o_ref):
        # batched over heads: [Hkv, S, hd] x [Hkv, 1, hd] -> [Hkv, S, 1]
        out = jax.lax.dot_general(
            k_ref[:], q_ref[:][:, None, :],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:] = out.reshape(out.shape[0], out.shape[1])

    A = (pl.pallas_call(kern_a,
                        out_shape=jax.ShapeDtypeStruct((S, Hkv), jnp.float32)),
         k)
    C = (pl.pallas_call(kern_c,
                        out_shape=jax.ShapeDtypeStruct((S, Hkv), jnp.float32)),
         k)
    B = (pl.pallas_call(kern_b,
                        out_shape=jax.ShapeDtypeStruct((Hkv, S), jnp.float32)),
         kt)

    ref = np.einsum("shd,hd->sh", np.asarray(k, np.float32),
                    np.asarray(q, np.float32))
    for name, (fn, karg), tr in (("A ew+f32sum", A, False),
                                 ("C bf16mul", C, False),
                                 ("B mxu-batched", B, True)):
        got = np.asarray(fn(karg, q), np.float32)
        if tr:
            got = got.T
        err = np.abs(got - ref).max() / np.abs(ref).max()
        t = timed(fn, karg, q)
        gops = 2 * S * Hkv * hd / t / 1e9
        print(f"{name}: {t * 1e6:7.2f} us  {gops:7.0f} Gop/s  relmax={err:.1e}")


if __name__ == "__main__":
    main()
