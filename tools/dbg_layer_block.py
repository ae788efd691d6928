"""Phase isolation for the full-layer kernel: run attention phase and MLP
phase separately (on-chip proven kernels) vs the layer kernel."""
import numpy as np
import jax.numpy as jnp

from owq_tpu.kernels.decode_block import (attn_block_reference,
                                          attn_block_step,
                                          layer_block_reference,
                                          layer_block_step)
from owq_tpu.kernels.gemv_fused import fused_matvec, fused_matvec_reference
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


def relmse(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(((a - b) ** 2).mean() / ((b ** 2).mean() + 1e-12))


bits = 3
S, Hkv, hd, rep = 512, 8, 128, 4
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
kw = dict(bits=bits, layer=1, scale=hd ** -0.5, eps=1e-5, rep=rep)

for pos in (0, 256, 511):
    p = jnp.asarray(pos, jnp.int32)
    # attention phase: kernel vs twin
    h1k, _, _ = attn_block_step(x, ks.copy(), vs.copy(), p, crow, srow,
                                wq, qaux, wo, oaux, qaux["gamma"], **kw)
    h1r, _, _ = attn_block_reference(x, ks, vs, p, crow, srow,
                                     wq, qaux, wo, oaux, qaux["gamma"],
                                     **kw)
    m_attn = relmse(h1k, h1r)
    # MLP phase from the SAME h1r: on-chip fused kernels vs jnp twin
    gu_k = fused_matvec(h1r, wg, gaux["sz"], bits=bits, pre="rmsnorm",
                        gamma=gaux["gamma"], sel=gaux["sel"],
                        ow=gaux["ow"], eps=1e-5, out_dtype=jnp.bfloat16)
    gu_r = fused_matvec_reference(h1r, wg, gaux["sz"], bits=bits,
                                  pre="rmsnorm", gamma=gaux["gamma"],
                                  sel=gaux["sel"], ow=gaux["ow"], eps=1e-5,
                                  out_dtype=jnp.bfloat16)
    m_gu = relmse(gu_k, gu_r)
    h2_k = fused_matvec(gu_r, wd, daux["sz"], bits=bits, pre="swiglu",
                        sel=daux["sel"], ow=daux["ow"], res=h1r, eps=1e-5,
                        out_dtype=jnp.bfloat16)
    h2_r = fused_matvec_reference(gu_r, wd, daux["sz"], bits=bits,
                                  pre="swiglu", sel=daux["sel"],
                                  ow=daux["ow"], res=h1r, eps=1e-5,
                                  out_dtype=jnp.bfloat16)
    m_dn = relmse(h2_k, h2_r)
    # full layer kernel vs twin
    hk, _, _ = layer_block_step(x, ks.copy(), vs.copy(), p, crow, srow,
                                wq, qaux, wo, oaux, wg, gaux, wd, daux,
                                **kw)
    hr, _, _ = layer_block_reference(x, ks, vs, p, crow, srow, wq, qaux,
                                     wo, oaux, wg, gaux, wd, daux, **kw)
    m_full = relmse(hk, hr)
    # layer kernel vs composed-phases (kernel attn + kernel mlp)
    hc = fused_matvec(
        fused_matvec(h1k, wg, gaux["sz"], bits=bits, pre="rmsnorm",
                     gamma=gaux["gamma"], sel=gaux["sel"], ow=gaux["ow"],
                     eps=1e-5, out_dtype=jnp.bfloat16),
        wd, daux["sz"], bits=bits, pre="swiglu", sel=daux["sel"],
        ow=daux["ow"], res=h1k, eps=1e-5, out_dtype=jnp.bfloat16)
    m_comp = relmse(hk, hc)
    # magnitudes
    print(f"pos={pos}: attn={m_attn:.2e} gu={m_gu:.2e} dn={m_dn:.2e} "
          f"full={m_full:.2e} vs_composed={m_comp:.2e} "
          f"|h1|={float(jnp.abs(h1r).max()):.1f} "
          f"|gu|={float(jnp.abs(gu_r).max()):.1f} "
          f"|h2|={float(jnp.abs(h2_r).max()):.1f}")

# --- conditioning check: 1-ulp input perturbation through the REFERENCE
# chain alone — if self-distance matches the kernel-vs-ref distance, the
# gap is amplification of benign rounding, not a kernel bug.
print("\nconditioning:")
for pos in (256, 511):
    p = jnp.asarray(pos, jnp.int32)
    hr, _, _ = layer_block_reference(x, ks, vs, p, crow, srow, wq, qaux,
                                     wo, oaux, wg, gaux, wd, daux, **kw)
    xp_ = (x.astype(jnp.float32) * (1.0 + 2.0 ** -9)).astype(jnp.bfloat16)
    hp, _, _ = layer_block_reference(xp_, ks, vs, p, crow, srow, wq, qaux,
                                     wo, oaux, wg, gaux, wd, daux, **kw)
    print(f"  pos={pos}: ref self-distance under 1-ulp x perturbation "
          f"= {relmse(hp, hr):.2e}")

print("\namplification through the reference MLP chain:")
for pos in (256,):
    p = jnp.asarray(pos, jnp.int32)
    h1k, _, _ = attn_block_step(x, ks.copy(), vs.copy(), p, crow, srow,
                                wq, qaux, wo, oaux, qaux["gamma"], **kw)
    h1r, _, _ = attn_block_reference(x, ks, vs, p, crow, srow,
                                     wq, qaux, wo, oaux, qaux["gamma"],
                                     **kw)
    def mlp_ref(h1):
        gu = fused_matvec_reference(h1, wg, gaux["sz"], bits=bits,
                                    pre="rmsnorm", gamma=gaux["gamma"],
                                    sel=gaux["sel"], ow=gaux["ow"],
                                    eps=1e-5, out_dtype=jnp.bfloat16)
        return fused_matvec_reference(gu, wd, daux["sz"], bits=bits,
                                      pre="swiglu", sel=daux["sel"],
                                      ow=daux["ow"], res=h1, eps=1e-5,
                                      out_dtype=jnp.bfloat16)
    a, b = mlp_ref(h1k), mlp_ref(h1r)
    nd = np.count_nonzero(np.asarray(h1k, np.float32)
                          != np.asarray(h1r, np.float32))
    print(f"  pos={pos}: h1 differing elts={nd}/{h1k.size} "
          f"d_h1={relmse(h1k, h1r):.2e} -> d_out={relmse(a, b):.2e}")
