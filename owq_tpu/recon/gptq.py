"""GPTQ-OWQ weight reconstruction as a jittable XLA pipeline.

Reference semantics (owq/recon.py:60-164, SURVEY.md §3.1):

  1. Rank input columns by ``diag(H)`` (optionally scaled by the per-column
     Frobenius error of a trial quantization) and move the top ``n_out``
     "weak" columns to the end; they are kept in full precision.
  2. Solve per-channel scale/zero on the remaining columns.
  3. Blocked column-by-column GPTQ: quantize a column, push the scaled
     residual into all later columns via the upper-Cholesky factor of the
     damped inverse Hessian.
  4. Weak columns absorb error feedback but are never quantized; the column
     permutation is inverted at the end.

The torch implementation is a Python double loop with GPU round-trips per
column.  Here the inner column recursion is a ``lax.fori_loop`` on a
[rows, blocksize] panel held in registers/VMEM, and the cross-block error
propagation is one MXU GEMM per block inside a ``lax.scan`` — the whole
layer reconstruction compiles to a single XLA program (one compilation per
(shape, n_out) signature, reused across transformer blocks).

Differences from the reference (documented, not behavioral):
  * The trailing update multiplies the full padded width with a column mask
    instead of a ragged slice (XLA needs static shapes); masked columns
    receive exact zeros, so results are identical.
  * All math is f32, like the reference (which disables tf32).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.quantizer import QuantSpec, find_params_minmax, find_params_mse

__all__ = ["GPTQResult", "select_outliers", "gptq_quantize", "rtn_quantize"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPTQResult:
    """Reconstruction output for one linear layer."""

    Q: jnp.ndarray          # [rows, cols] fake-quantized weight (original order)
    scale: jnp.ndarray      # [rows] per-output-channel scale
    zero: jnp.ndarray       # [rows] per-output-channel zero-point
    out_ids: jnp.ndarray    # [n_out] sorted weak-column indices (int32)
    loss: jnp.ndarray       # scalar sum of (w-q)^2 / d^2 / 2 (reference's `error`)


def select_outliers(H: jnp.ndarray, n_out: int, *, actorder: bool = False,
                    frob_norm: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick weak columns and build the working permutation.

    Returns (ids [cols], out_ids [n_out] sorted).  Mirrors
    ``GPTQ_OWQ.hessian_sorting`` (owq/recon.py:60-82): weak columns are the
    top-n_out of diag(H) (optionally * frob_norm), moved to the end; the
    remaining columns keep natural order unless ``actorder`` sorts them by
    descending diagonal.
    """
    cols = H.shape[0]
    hdiag = jnp.diagonal(H)
    if frob_norm is not None:
        hdiag = hdiag * frob_norm
    if n_out == 0:
        if actorder:
            ids = jnp.argsort(-hdiag, stable=True)
        else:
            ids = jnp.arange(cols)
        return ids, jnp.zeros((0,), jnp.int32)

    desc = jnp.argsort(-hdiag, stable=True)
    outliers = desc[:n_out]
    if actorder:
        ids = jnp.concatenate([desc[n_out:], outliers])
    else:
        is_out = jnp.zeros((cols,), jnp.int32).at[outliers].set(1)
        # stable sort on the outlier flag keeps non-outliers in natural order
        keep = jnp.argsort(is_out, stable=True)[: cols - n_out]
        ids = jnp.concatenate([keep, outliers])
    return ids, jnp.sort(outliers).astype(jnp.int32)


def _cholesky_inv_upper(H: jnp.ndarray, block_threshold: int = 4096,
                        blk: int = 1024) -> jnp.ndarray:
    """Upper-triangular U with U^T U = H^{-1} (owq/recon.py:116-119).

    For wide layers the identity RHS is solved in column blocks: XLA's
    triangular solve materializes O(n * rhs_cols) temporaries, which at
    11008^2 (llama down-proj) needs >20GB HBM when solved in one shot.
    """
    n = H.shape[0]
    L = jnp.linalg.cholesky(H)
    if n <= block_threshold:
        eye = jnp.eye(n, dtype=H.dtype)
        Hinv = jax.scipy.linalg.cho_solve((L, True), eye)
    else:
        n_pad = -(-n // blk) * blk

        def solve_block(start):
            cols = (jax.lax.broadcasted_iota(jnp.int32, (n, blk), 1)
                    + start) == jax.lax.broadcasted_iota(jnp.int32, (n, blk), 0)
            return jax.scipy.linalg.cho_solve((L, True),
                                              cols.astype(H.dtype))

        blocks = jax.lax.map(solve_block,
                             jnp.arange(0, n_pad, blk, dtype=jnp.int32))
        Hinv = jnp.moveaxis(blocks, 0, 1).reshape(n, n_pad)[:, :n]
    # Symmetrize before the second factorization for numerical hygiene.
    Hinv = 0.5 * (Hinv + Hinv.T)
    return jnp.linalg.cholesky(Hinv).T


def _quant_col(w, scale, zero, minq, maxq):
    q = jnp.clip(jnp.round(w / scale) + zero, minq, maxq)
    return scale * (q - zero)


@partial(jax.jit, static_argnames=("spec", "n_out", "blocksize", "percdamp",
                                   "actorder", "mse", "num", "groupsize"))
def gptq_quantize(W: jnp.ndarray, H: jnp.ndarray, spec: QuantSpec, n_out: int,
                  *, frob_norm: Optional[jnp.ndarray] = None,
                  percdamp: float = 0.01, blocksize: int = 128,
                  actorder: bool = False, mse: bool = True, num: int = 100,
                  groupsize: int = -1) -> GPTQResult:
    """Reconstruct one linear layer.  W: [rows, cols] (out, in), H: [cols, cols]."""
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)
    rows, cols = W.shape
    n_nonout = cols - n_out
    minq, maxq = float(spec.minq), float(spec.maxq)

    ids, out_ids = select_outliers(H, n_out, actorder=actorder, frob_norm=frob_norm)
    if n_out > 0 or actorder:
        W = jnp.take(W, ids, axis=1)
        H = jnp.take(jnp.take(H, ids, axis=0), ids, axis=1)

    if mse:
        scale, zero = find_params_mse(W[:, :n_nonout], spec, num=num)
    else:
        scale, zero = find_params_minmax(W[:, :n_nonout], spec)

    dead = jnp.diagonal(H) == 0
    H = jnp.where(jnp.diag(dead), 1.0, H)
    W = jnp.where(dead[None, :], 0.0, W)

    damp = percdamp * jnp.mean(jnp.diagonal(H))
    H = H + damp * jnp.eye(cols, dtype=H.dtype)
    Hinv = _cholesky_inv_upper(H)

    nb = -(-n_nonout // blocksize)
    cols_pad = max(cols, nb * blocksize)
    if groupsize != -1:
        # Refit windows are fixed-width dynamic slices [g, g+groupsize);
        # pad so the last window (g = n_nonout-1) never clamps.  Columns
        # >= n_nonout are zero-masked inside the fit, which is exactly
        # neutral: a zero column quantizes to zero error under any
        # (scale, zero) candidate, and per-row min/max are unchanged
        # (xmin/xmax are clamped to <=0/>=0 anyway, quant.py:73-75).
        cols_pad = max(cols_pad, n_nonout - 1 + groupsize)
    pad = cols_pad - cols
    if pad:
        W = jnp.pad(W, ((0, 0), (0, pad)))
        # identity diagonal on the padding keeps d != 0
        Hinv = jnp.pad(Hinv, ((0, pad), (0, pad))) + jnp.diag(
            jnp.pad(jnp.zeros((cols,), W.dtype), (0, pad), constant_values=1.0))

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, cols_pad), 1)

    def block_step(carry, b):
        W_c, Q_c, loss_c, scale_c, zero_c = carry
        start = b * blocksize

        W1 = jax.lax.dynamic_slice(W_c, (0, start), (rows, blocksize))
        Hinv1 = jax.lax.dynamic_slice(Hinv, (start, start), (blocksize, blocksize))
        iota1 = jax.lax.broadcasted_iota(jnp.int32, (1, blocksize), 1)

        def col_step(i, inner):
            W1_i, Err1, Q1, loss_i, sc, zc = inner
            gcol = start + i
            active = gcol < n_nonout

            if groupsize != -1:
                # Reference refit every ``groupsize`` columns
                # (owq/recon.py:134-137): find_params(num=40) on
                # W[:, g : min(g+groupsize, n_nonout)] read from W — NOT
                # the error-fed block panel W1 — so the window sees
                # as-of-block-start values for in-block columns.  W_c (the
                # scan carry, committed at block boundaries only) gives
                # exactly those semantics at any alignment.  The window is
                # a fixed-width slice with columns >= n_nonout zero-masked
                # (neutral: see cols_pad comment above).
                def refit(args):
                    win = jax.lax.dynamic_slice(W_c, (0, gcol),
                                                (rows, groupsize))
                    wiota = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, groupsize), 1) + gcol)
                    win = jnp.where(wiota < n_nonout, win, 0.0)
                    if mse:
                        return find_params_mse(win, spec, num=40)
                    return find_params_minmax(win, spec)

                sc, zc = jax.lax.cond(
                    jnp.logical_and(active, gcol % groupsize == 0),
                    refit, lambda a: a, (sc, zc))

            w = jax.lax.dynamic_slice(W1_i, (0, i), (rows, 1))[:, 0]
            d = jax.lax.dynamic_slice(Hinv1, (i, i), (1, 1))[0, 0]
            q = _quant_col(w, sc, zc, minq, maxq)
            q = jnp.where(active, q, w)
            err = jnp.where(active, (w - q) / d, 0.0)
            loss_i = loss_i + jnp.sum(jnp.where(active, (w - q) ** 2 / d ** 2, 0.0))

            hrow = jax.lax.dynamic_slice(Hinv1, (i, 0), (1, blocksize))
            upd = err[:, None] * jnp.where(iota1 >= i, hrow, 0.0)
            W1_i = W1_i - upd
            Err1 = jax.lax.dynamic_update_slice(Err1, err[:, None], (0, i))
            Q1 = jax.lax.dynamic_update_slice(Q1, q[:, None], (0, i))
            return W1_i, Err1, Q1, loss_i, sc, zc

        Err0 = jnp.zeros((rows, blocksize), W1.dtype)
        W1f, Err1, Q1, loss_c, scale_c, zero_c = jax.lax.fori_loop(
            0, blocksize, col_step,
            (W1, Err0, jnp.zeros_like(W1), loss_c, scale_c, zero_c))

        W_c = jax.lax.dynamic_update_slice(W_c, W1f, (0, start))
        Q_c = jax.lax.dynamic_update_slice(Q_c, Q1, (0, start))

        # Cross-block error propagation: one GEMM, masked to cols > block end.
        hrows = jax.lax.dynamic_slice(Hinv, (start, 0), (blocksize, cols_pad))
        mask = (col_iota >= start + blocksize).astype(W_c.dtype)
        W_c = W_c - jnp.dot(Err1, hrows * mask, preferred_element_type=jnp.float32)
        return (W_c, Q_c, loss_c, scale_c, zero_c), None

    Q0 = jnp.zeros_like(W)
    (Wf, Qf, loss, scale, zero), _ = jax.lax.scan(
        block_step, (W, Q0, jnp.float32(0.0), scale, zero),
        jnp.arange(nb))

    # Quantized columns from Q, error-fed weak columns from W.
    keep_q = jax.lax.broadcasted_iota(jnp.int32, (1, cols_pad), 1) < n_nonout
    Q = jnp.where(keep_q, Qf, Wf)[:, :cols]

    if n_out > 0 or actorder:
        inv = jnp.argsort(ids)
        Q = jnp.take(Q, inv, axis=1)

    return GPTQResult(Q=Q, scale=scale, zero=zero, out_ids=out_ids, loss=loss / 2.0)


@partial(jax.jit, static_argnames=("spec", "mse", "num"))
def rtn_quantize(W: jnp.ndarray, spec: QuantSpec, *, mse: bool = False,
                 num: int = 100) -> jnp.ndarray:
    """Round-to-nearest fake quantization of a full weight matrix.

    The reference's ``--nearest`` path (main.py:227-233): per-channel params
    from min/max (mse=False there), then plain rounding.
    """
    W = W.astype(jnp.float32)
    if mse:
        scale, zero = find_params_mse(W, spec, num=num)
    else:
        scale, zero = find_params_minmax(W, spec)
    return _quant_col(W, scale[:, None], zero[:, None], float(spec.minq), float(spec.maxq))
