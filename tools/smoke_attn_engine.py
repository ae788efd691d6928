"""On-chip smoke for the batched engine attention kernel (attn_engine.py):
parity vs the jnp twin at llama-7b b8 shapes with ragged slot lengths,
plus scanned timing."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_attn_engine import (engine_attn_applicable,
                                         engine_attn_reference,
                                         engine_attn_step)

rng = np.random.default_rng(0)


def relmse(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(((a - b) ** 2).mean() / ((b ** 2).mean() + 1e-12))


def run_case(L, B, S, Hkv, hd, rep, pos_list):
    Hq = rep * Hkv
    layer = 1
    scale = hd ** -0.5
    mkb = lambda *sh: jnp.asarray(  # noqa: E731
        rng.standard_normal(sh).astype(np.float32)).astype(jnp.bfloat16)
    ks = mkb(L, B, S, Hkv, hd)
    vs = mkb(L, B, S, Hkv, hd)
    q = mkb(B, Hq, hd)
    kn = mkb(B, Hkv, hd)
    vn = mkb(B, Hkv, hd)
    pos = jnp.asarray(pos_list, jnp.int32)

    ctx, k2, v2 = engine_attn_step(q, kn, vn, ks.copy(), vs.copy(), pos,
                                   layer=layer, scale=scale, rep=rep)
    ctx_r, kr, vr = engine_attn_reference(q, kn, vn, ks, vs, pos,
                                          layer=layer, scale=scale,
                                          rep=rep)
    m = relmse(ctx, ctx_r)
    cache_ok = (bool(jnp.array_equal(k2, kr))
                and bool(jnp.array_equal(v2, vr)))
    print(f"B{B} S{S} Hkv{Hkv} rep{rep}: ctx rel-mse={m:.3e} "
          f"cache_exact={cache_ok}")
    return ks, vs, q, kn, vn, pos, layer, scale


def main():
    assert engine_attn_applicable(8, 160, 32, 128, 1)
    # ragged lengths incl. edges: empty, 1, chunk-1, chunk, mid, full, overrun
    ks, vs, q, kn, vn, pos, layer, scale = run_case(
        2, 8, 160, 32, 128, 1, [0, 1, 31, 32, 80, 128, 159, 165])
    run_case(2, 8, 256, 8, 128, 4, [0, 5, 100, 200, 255, 300, 17, 63])
    run_case(2, 16, 160, 32, 128, 1, list(range(3, 160, 10))[:16])

    # timing: scanned loop at the bench shape, mixed lengths
    n = 100

    @jax.jit
    def run(q0, kc, vc):
        def body(carry, _):
            q0, kc, vc = carry
            ctx, kc, vc = engine_attn_step(q0, kn, vn, kc, vc, pos,
                                           layer=layer, scale=scale, rep=1)
            return (ctx.reshape(q0.shape), kc, vc), ()
        (qf, kc, vc), _ = jax.lax.scan(body, (q0, kc, vc), None, length=n)
        return qf, kc, vc

    o, kc, vc = run(q, ks.copy(), vs.copy())
    jax.block_until_ready(o)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        o, kc, vc = run(o, kc, vc)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / (n * reps)
    full = 2 * 8 * 160 * 32 * 128 * 2            # full-pool k+v bytes
    avgpos = float(np.minimum(np.asarray(pos), 159).mean() + 1)
    print(f"per-layer-step: {dt * 1e6:.1f} us  full-pool read would be "
          f"{full / 755e9 * 1e6:.1f} us; valid rows avg {avgpos:.0f}/160")
    return 0





def timing_case(S, pos_list, label):
    import time as _t
    L, B, Hkv, hd, rep = 2, 8, 32, 128, 1
    Hq = rep * Hkv
    layer, scale = 1, hd ** -0.5
    mkb = lambda *sh: jnp.asarray(  # noqa: E731
        rng.standard_normal(sh).astype(np.float32)).astype(jnp.bfloat16)
    ks, vs = mkb(L, B, S, Hkv, hd), mkb(L, B, S, Hkv, hd)
    q, kn, vn = mkb(B, Hq, hd), mkb(B, Hkv, hd), mkb(B, Hkv, hd)
    pos = jnp.asarray(pos_list, jnp.int32)
    n = 100

    @jax.jit
    def run(q0, kc, vc):
        def body(carry, _):
            q0, kc, vc = carry
            ctx, kc, vc = engine_attn_step(q0, kn, vn, kc, vc, pos,
                                           layer=layer, scale=scale, rep=1)
            return (ctx.reshape(q0.shape), kc, vc), ()
        (qf, kc, vc), _ = jax.lax.scan(body, (q0, kc, vc), None, length=n)
        return qf, kc, vc

    o, kc, vc = run(q, ks.copy(), vs.copy())
    jax.block_until_ready(o)
    t0 = _t.perf_counter()
    for _ in range(5):
        o, kc, vc = run(o, kc, vc)
    jax.block_until_ready(o)
    dt = (_t.perf_counter() - t0) / (n * 5)
    full = 2 * B * S * Hkv * hd * 2
    print(f"{label}: {dt * 1e6:.1f} us/layer-step  "
          f"(full-pool DMA bound {full / 755e9 * 1e6:.1f} us)")


if __name__ == "__main__":
    rc = main()
    timing_case(1024, [0, 100, 300, 500, 700, 900, 1000, 1023], "S=1024 ragged")
    timing_case(1024, [1000] * 8, "S=1024 full")
    raise SystemExit(rc)
