import numpy as np
import pytest

from owq_tpu.core import QuantSpec, fake_quant
from owq_tpu.recon import gptq_quantize, rtn_quantize, select_outliers, HessianAccumulator
import oracle


def make_problem(rng, rows=24, cols=96, nsamp=48):
    W = (rng.standard_normal((rows, cols)) * 0.5).astype(np.float32)
    X = rng.standard_normal((nsamp, cols)).astype(np.float32)
    # a few high-energy input columns -> natural outliers
    X[:, 7] *= 12.0
    X[:, 33] *= 9.0
    H = (2.0 / nsamp) * (X.T @ X)
    return W, H.astype(np.float32), X


def recon_err(W, Q, H):
    """Proxy loss tr((W-Q) H (W-Q)^T)."""
    D = W - Q
    return float(np.sum((D @ H) * D))


@pytest.mark.parametrize("n_out", [0, 4])
@pytest.mark.parametrize("actorder", [False, True])
def test_matches_oracle(rng, n_out, actorder):
    W, H, _ = make_problem(rng)
    spec = QuantSpec(3, False)
    res = gptq_quantize(W, H, spec, n_out, actorder=actorder,
                        mse=False, blocksize=32)
    Qo, so, zo, oo, _ = oracle.gptq_oracle(W, H, 3, False, n_out,
                                           actorder=actorder, mse=False,
                                           blocksize=32)
    np.testing.assert_allclose(np.asarray(res.scale), so, rtol=1e-5)
    np.testing.assert_array_equal(np.sort(np.asarray(res.out_ids)),
                                  np.sort(oo))
    np.testing.assert_allclose(np.asarray(res.Q), Qo, rtol=2e-3, atol=2e-4)


def test_outliers_kept_near_fp(rng):
    """Weak columns stay close to FP (only error feedback moves them)."""
    W, H, _ = make_problem(rng)
    spec = QuantSpec(3, False)
    res = gptq_quantize(W, H, spec, 4, mse=False)
    ids = np.asarray(res.out_ids)
    assert 7 in ids and 33 in ids  # the high-energy columns get selected
    Q = np.asarray(res.Q)
    # outlier columns are NOT on the quantization grid (they kept FP values)
    s, z = np.asarray(res.scale), np.asarray(res.zero)
    col = Q[:, 7]
    grid_dist = np.abs(col / s - np.round(col / s))
    assert grid_dist.max() > 0.05


def test_gptq_beats_rtn(rng):
    W, H, _ = make_problem(rng, rows=32, cols=128)
    spec = QuantSpec(3, False)
    q_rtn = np.asarray(rtn_quantize(W, spec))
    res = gptq_quantize(W, H, spec, 0, mse=False)
    assert recon_err(W, np.asarray(res.Q), H) < recon_err(W, q_rtn, H)


def test_owq_beats_plain_gptq(rng):
    W, H, _ = make_problem(rng, rows=32, cols=128)
    spec = QuantSpec(3, False)
    res0 = gptq_quantize(W, H, spec, 0, mse=False)
    res4 = gptq_quantize(W, H, spec, 4, mse=False)
    assert recon_err(W, np.asarray(res4.Q), H) < recon_err(W, np.asarray(res0.Q), H)


def test_frob_norm_changes_selection(rng):
    W, H, _ = make_problem(rng)
    frob = np.ones(W.shape[1], np.float32)
    frob[50] = 1e6  # force column 50 into the outlier set
    _, out_ids = select_outliers(H, 2, frob_norm=frob)
    assert 50 in np.asarray(out_ids)


def test_groupsize_runs(rng):
    W, H, _ = make_problem(rng, rows=16, cols=96)
    spec = QuantSpec(4, False)
    res = gptq_quantize(W, H, spec, 0, mse=False, blocksize=32, groupsize=32)
    assert np.isfinite(np.asarray(res.Q)).all()
    # group refits should not be catastrophically worse than per-channel
    resf = gptq_quantize(W, H, spec, 0, mse=False, blocksize=32)
    assert recon_err(W, np.asarray(res.Q), H) < 4 * recon_err(W, np.asarray(resf.Q), H)


def test_hessian_accumulator_matches_reference_semantics(rng):
    cols = 16
    acc = HessianAccumulator(cols)
    xs = [rng.standard_normal((1, 10, cols)).astype(np.float32) for _ in range(4)]
    for x in xs:
        acc.update(x)
    H = np.asarray(acc.finalize())
    # reference: H = (2/N) * sum_samples X_s^T X_s  (owq/recon.py:54-57)
    Href = np.zeros((cols, cols), np.float32)
    for x in xs:
        m = x.reshape(-1, cols)
        Href += m.T @ m
    Href *= 2.0 / 4
    np.testing.assert_allclose(H, Href, rtol=1e-5)


def test_dead_columns(rng):
    """Columns with zero Hessian diagonal are zeroed, not NaN."""
    W, H, _ = make_problem(rng, rows=8, cols=64)
    H[5, :] = 0.0
    H[:, 5] = 0.0
    res = gptq_quantize(W, H, QuantSpec(3, False), 0, mse=False, blocksize=32)
    Q = np.asarray(res.Q)
    assert np.isfinite(Q).all()


def test_blocked_cholesky_inverse_matches(rng):
    """Column-blocked identity solve (wide-layer HBM path) == direct."""
    import jax.numpy as jnp

    from owq_tpu.recon.gptq import _cholesky_inv_upper

    X = rng.standard_normal((40, 96)).astype(np.float32)
    H = X.T @ X + 0.1 * np.eye(96, dtype=np.float32)
    direct = np.asarray(_cholesky_inv_upper(jnp.asarray(H)))
    blocked = np.asarray(_cholesky_inv_upper(jnp.asarray(H),
                                             block_threshold=16, blk=32))
    np.testing.assert_allclose(blocked, direct, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("groupsize,blocksize", [(32, 32), (48, 32),
                                                 (40, 32), (96, 32)])
@pytest.mark.parametrize("n_out", [0, 4])
def test_groupsize_matches_oracle(rng, groupsize, blocksize, n_out):
    """Arbitrary --groupsize alignment (reference recon.py:129-150): refits
    may land mid-block; the window reads as-of-block-start values truncated
    at n_nonout.  48/40 are NOT multiples of the 32 blocksize."""
    W, H, _ = make_problem(rng)
    spec = QuantSpec(3, False)
    res = gptq_quantize(W, H, spec, n_out, mse=False, blocksize=blocksize,
                        groupsize=groupsize)
    Qo, so, zo, oo, _ = oracle.gptq_oracle(W, H, 3, False, n_out, mse=False,
                                           blocksize=blocksize,
                                           groupsize=groupsize)
    np.testing.assert_array_equal(np.sort(np.asarray(res.out_ids)),
                                  np.sort(oo))
    np.testing.assert_allclose(np.asarray(res.Q), Qo, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.scale), so, rtol=1e-5)


@pytest.mark.parametrize("actorder", [False, True])
def test_groupsize_mse_actorder_matches_oracle(rng, actorder):
    """Unaligned groupwise refits with the 40-step MSE grid x act-order."""
    W, H, _ = make_problem(rng, rows=12, cols=64)
    spec = QuantSpec(3, False)
    res = gptq_quantize(W, H, spec, 2, mse=True, blocksize=32, groupsize=24,
                        actorder=actorder)
    Qo, *_ = oracle.gptq_oracle(W, H, 3, False, 2, mse=True, blocksize=32,
                                groupsize=24, actorder=actorder)
    np.testing.assert_allclose(np.asarray(res.Q), Qo, rtol=2e-3, atol=2e-4)
