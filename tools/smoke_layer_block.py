"""Quick on-chip smoke for the full-layer mega kernel (decode_block.py).

Runs layer_block_step vs layer_block_reference at a 7B-GQA-like shape and
prints rel-MSE + per-layer timing.  Superseded by the sweep in
tools/verify_tpu.py; kept as a fast single-shape check.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from owq_tpu.kernels.decode_block import (layer_block_applicable,
                                          layer_block_reference,
                                          layer_block_step)
from owq_tpu.core.packing import padded_infeatures

rng = np.random.default_rng(0)


def rand_packed(infeat, out, bits):
    _, nw = padded_infeatures(infeat, bits)
    qw = rng.integers(-2**31, 2**31 - 1, size=(nw, out),
                      dtype=np.int64).astype(np.int32)
    s = rng.uniform(size=out).astype(np.float32) * 0.01 + 0.001
    z = np.full(out, float(2 ** (bits - 1)), np.float32)
    return jnp.asarray(qw), jnp.asarray(s), jnp.asarray(z)


def mkaux(infeat, out, bits, gamma=False, weak=0):
    qw, s, z = rand_packed(infeat, out, bits)
    aux = {"sz": jnp.stack([s, s * (z + 128.0)]),
           "sel": None, "ow": None, "bias": None}
    if weak:
        wids = np.sort(rng.choice(infeat, weak, replace=False))
        cols = ((weak + 7) // 8) * 8
        selm = np.zeros((infeat, cols), np.float32)
        selm[wids, np.arange(weak)] = 1.0
        aux["sel"] = jnp.asarray(selm, jnp.bfloat16)
        aux["ow"] = jnp.asarray((rng.standard_normal((cols, out)) * 0.01)
                                .astype(np.float32), jnp.bfloat16)
    if gamma:
        aux["gamma"] = jnp.asarray(
            1.0 + 0.1 * rng.standard_normal((1, infeat)).astype(np.float32)
        ).astype(jnp.bfloat16)
    return qw, aux


def main():
    bits = 3
    S, Hkv, hd, rep = 512, 32, 128, 1
    hidden = rep * Hkv * hd            # 4096
    inter = 11008
    out_q = (rep + 2) * Hkv * hd
    wq, qaux = mkaux(hidden, out_q, bits, gamma=True, weak=6)
    wo, oaux = mkaux(hidden, hidden, bits, weak=6)
    wg, gaux = mkaux(hidden, 2 * inter, bits, gamma=True, weak=6)
    wd, daux = mkaux(inter, hidden, bits, weak=6)
    ok = layer_block_applicable(S, Hkv, hd, rep, out_q, wq.shape[0],
                                hidden, wo.shape[0], 2 * inter, wg.shape[0],
                                hidden, wd.shape[0])
    print("applicable:", ok)
    if not ok:
        return 1

    mkb = lambda *sh: jnp.asarray(  # noqa: E731
        rng.standard_normal(sh).astype(np.float32)).astype(jnp.bfloat16)
    x = mkb(1, hidden)
    L = 2
    ks = mkb(L, 1, S, Hkv, hd)
    vs = mkb(L, 1, S, Hkv, hd)
    crow = jnp.asarray(np.cos(np.linspace(0, 2, hd)).astype(np.float32)
                       ).reshape(1, hd)
    srow = jnp.asarray(np.sin(np.linspace(0, 2, hd)).astype(np.float32)
                       ).reshape(1, hd)
    kw = dict(bits=bits, layer=1, scale=hd ** -0.5, eps=1e-5, rep=rep)

    for pos in (0, S // 2, S - 1):
        p = jnp.asarray(pos, jnp.int32)
        h, k2, v2 = layer_block_step(x, ks.copy(), vs.copy(), p, crow, srow,
                                     wq, qaux, wo, oaux, wg, gaux, wd, daux,
                                     **kw)
        hr, kr, vr = layer_block_reference(x, ks, vs, p, crow, srow,
                                           wq, qaux, wo, oaux, wg, gaux,
                                           wd, daux, **kw)
        h, hr = np.asarray(h, np.float32), np.asarray(hr, np.float32)
        mse = float(((h - hr) ** 2).mean() / ((hr ** 2).mean() + 1e-12))
        k2n, krn = np.asarray(k2, np.float32), np.asarray(kr, np.float32)
        row = np.abs(k2n[1, 0, pos] - krn[1, 0, pos]).max()
        oth = np.abs(np.delete(k2n[1, 0], pos, 0)
                     - np.delete(krn[1, 0], pos, 0)).max()
        print(f"pos={pos}: h rel-mse={mse:.3e} krow={row:.3e} "
              f"kothers={oth:.1e}")

    # timing: scanned loop (one dispatch), like the real decode path
    p = jnp.asarray(S // 2, jnp.int32)
    n = 100

    @jax.jit
    def run(x0, kc, vc):
        def body(carry, _):
            h, kc, vc = carry
            h, kc, vc = layer_block_step(h, kc, vc, p, crow, srow,
                                         wq, qaux, wo, oaux, wg, gaux,
                                         wd, daux, **kw)
            return (h, kc, vc), ()
        (h, kc, vc), _ = jax.lax.scan(body, (x0, kc, vc), None, length=n)
        return h, kc, vc

    h, kc, vc = run(x, ks.copy(), vs.copy())
    jax.block_until_ready(h)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        h, kc, vc = run(h, kc, vc)
    jax.block_until_ready(h)
    dt = (time.perf_counter() - t0) / (n * reps)
    wbytes = sum(int(w.nbytes) for w in (wq, wo, wg, wd))
    print(f"per-layer: {dt * 1e6:.1f} us  weights={wbytes / 2 ** 20:.1f}MiB"
          f"  eff-bw={wbytes / dt / 1e9:.1f} GB/s")
    return 0





def chain_timing():
    """Same shapes through the EXISTING split path: attn_block_step +
    fused_matvec(gu) + fused_matvec(down), scanned."""
    import time as _t
    from owq_tpu.kernels.gemv_fused import fused_matvec
    # rebuild the same tensors (module-level rng state differs; shapes same)
    bits = 3
    S, Hkv, hd, rep = 512, 32, 128, 1
    hidden = rep * Hkv * hd
    inter = 11008
    out_q = (rep + 2) * Hkv * hd
    wq, qaux = mkaux(hidden, out_q, bits, gamma=True, weak=6)
    wo, oaux = mkaux(hidden, hidden, bits, weak=6)
    wg, gaux = mkaux(hidden, 2 * inter, bits, gamma=True, weak=6)
    wd, daux = mkaux(inter, hidden, bits, weak=6)
    mkb = lambda *sh: jnp.asarray(  # noqa: E731
        rng.standard_normal(sh).astype(np.float32)).astype(jnp.bfloat16)
    x = mkb(1, hidden)
    ks = mkb(2, 1, S, Hkv, hd)
    vs = mkb(2, 1, S, Hkv, hd)
    crow = jnp.asarray(np.cos(np.linspace(0, 2, hd)).astype(np.float32)
                       ).reshape(1, hd)
    srow = jnp.asarray(np.sin(np.linspace(0, 2, hd)).astype(np.float32)
                       ).reshape(1, hd)
    p = jnp.asarray(S // 2, jnp.int32)
    n = 100

    @jax.jit
    def run(x0, kc, vc):
        def body(carry, _):
            h, kc, vc = carry
            h1, kc, vc = attn_block_step(
                h, kc, vc, p, crow, srow, wq, qaux, wo, oaux,
                qaux["gamma"], bits=bits, layer=1, scale=hd ** -0.5,
                eps=1e-5, rep=rep)
            gu = fused_matvec(h1, wg, gaux["sz"], bits=bits, pre="rmsnorm",
                              gamma=gaux["gamma"], sel=gaux["sel"],
                              ow=gaux["ow"], eps=1e-5,
                              out_dtype=jnp.bfloat16)
            h2 = fused_matvec(gu, wd, daux["sz"], bits=bits, pre="swiglu",
                              sel=daux["sel"], ow=daux["ow"], res=h1,
                              eps=1e-5, out_dtype=jnp.bfloat16)
            return (h2, kc, vc), ()
        (h, kc, vc), _ = jax.lax.scan(body, (x0, kc, vc), None, length=n)
        return h, kc, vc

    from owq_tpu.kernels.decode_block import attn_block_step
    h, kc, vc = run(x, ks.copy(), vs.copy())
    jax.block_until_ready(h)
    reps = 5
    t0 = _t.perf_counter()
    for _ in range(reps):
        h, kc, vc = run(h, kc, vc)
    jax.block_until_ready(h)
    dt = (_t.perf_counter() - t0) / (n * reps)
    wbytes = sum(int(w.nbytes) for w in (wq, wo, wg, wd))
    print(f"split-chain per-layer: {dt * 1e6:.1f} us  "
          f"eff-bw={wbytes / dt / 1e9:.1f} GB/s")


if __name__ == "__main__" or True:
    pass


if __name__ == "__main__":
    rc = main()
    chain_timing()
    raise SystemExit(rc)
