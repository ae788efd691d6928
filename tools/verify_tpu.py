"""On-hardware validation sweep (the reference test_kernel.py analogue).

Runs on the real TPU: kernel-vs-fake-quant parity (Mosaic-compiled, not
interpreted), paired-path parity, packed-vs-dense model forward parity, and
decode determinism.  Prints PASS/FAIL lines; exits nonzero on failure.
"""

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from owq_tpu.core import QuantSpec, find_params
    from owq_tpu.kernels.gemv import packed_matmul_kernel, quant_matmul
    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.runtime.generate import generate
    from owq_tpu.runtime.quant_linear import pack_linear
    from functools import partial

    failures = 0

    def check(name, ok, detail=""):
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)
        failures += 0 if ok else 1

    rng = np.random.default_rng(0)

    # 1. fused kernel vs fake-quant simulation (f32 activations => exact)
    for bits in (3, 4):
        out, infeat, n_out = 256, 512, 4
        W = rng.standard_normal((out, infeat)).astype(np.float32) * 0.2
        spec = QuantSpec(bits, False)
        s, z = find_params(W, spec, mse=False)
        s, z = np.asarray(s), np.asarray(z)
        q = np.clip(np.round(W / s[:, None]) + z[:, None], 0, 2 ** bits - 1)
        Wf = s[:, None] * (q - z[:, None])
        ids = np.sort(rng.choice(infeat, n_out, replace=False)).astype(np.int32)
        Wf[:, ids] = W[:, ids]
        p = pack_linear(Wf, s, z, ids, bits, weight_dtype=jnp.float32)
        x = rng.standard_normal((3, infeat)).astype(np.float32)
        got = np.asarray(quant_matmul(p, jnp.asarray(x), interpret=False))
        mse = float(np.mean((got - x @ Wf.T) ** 2))
        check(f"kernel_parity_{bits}bit", mse < 1e-6, f"mse={mse:.2e}")

    # 2. paired bf16-bitcast path vs generic (same integer product + 128*sum)
    nw, out = 416, 512
    qw = jnp.asarray(rng.integers(-2**31, 2**31 - 1, size=(nw, out),
                                  dtype=np.int64).astype(np.int32))
    xb = jnp.asarray(rng.standard_normal((8, nw * 10)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    a = np.asarray(packed_matmul_kernel(xb, qw, bits=3, paired=False))
    b = np.asarray(packed_matmul_kernel(xb, qw, bits=3, paired=True))
    xs = np.asarray(jnp.sum(xb.astype(jnp.float32), axis=-1))
    rel = np.abs((b - 128.0 * xs[:, None]) - a).max() / (np.abs(a).max() + 1e-9)
    check("paired_path_parity", rel < 1e-4, f"rel={rel:.2e}")

    # 3. packed model: pallas vs xla kernel logits agree (exact f32 mode;
    # token-level comparison is meaningless on a random model whose logits
    # are near-ties everywhere)
    from owq_tpu.models.transformer import forward

    cfg = synthetic_config("llama-tiny", max_pos=64)
    params = jax.jit(partial(build_synthetic, cfg, bits=3,
                             dtype=jnp.float32))()
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 8)).astype(np.int32)

    @partial(jax.jit, static_argnames=("kern",))
    def logits_of(params, ids, kern):
        return forward(params, cfg, ids, kernel=kern, dtype=jnp.float32)[0]

    lp = np.asarray(logits_of(params, jnp.asarray(prompt), "pallas"))
    lx = np.asarray(logits_of(params, jnp.asarray(prompt), "xla"))
    rel = np.abs(lp - lx).max() / (np.abs(lx).max() + 1e-9)
    # Per-linear parity is ~1e-6 (step 1); norm/softmax chains amplify the
    # residual rounding over the blocks, so the model-level gate is 1e-3.
    check("pallas_vs_xla_logits", rel < 1e-3, f"rel={rel:.2e}")

    # 4. decode determinism (greedy twice -> identical)
    t1 = generate(params, cfg, prompt, 12, kernel="pallas",
                  cache_dtype=jnp.float32)[0].tolist()
    t2 = generate(params, cfg, prompt, 12, kernel="pallas",
                  cache_dtype=jnp.float32)[0].tolist()
    check("decode_determinism", t2 == t1)

    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
