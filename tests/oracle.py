"""Pure-numpy oracles for golden tests.

Independent float64/float32 implementations of the quantization semantics
described in SURVEY.md (scale/zero solvers, GPTQ-OWQ reconstruction).  Used
to validate the vectorized jnp implementations; deliberately written in the
most literal, loop-heavy style so they are easy to audit against the
reference's documented behavior (owq/quant.py, owq/recon.py).
"""

import numpy as np

EPS = 1e-8


def grid(bits, sym):
    n = 2 ** bits
    if sym:
        return -((n - 1) // 2 + 1), (n - 1) // 2
    return 0, n - 1


def fake_quant(x, scale, zero, minq, maxq):
    q = np.clip(np.round(x / scale) + zero, minq, maxq)
    return scale * (q - zero)


def find_params_minmax_oracle(x, bits, sym):
    x = np.asarray(x, np.float32)
    minq, maxq = grid(bits, sym)
    scales, zeros = [], []
    for row in x:
        xmin = min(row.min(), 0.0)
        xmax = max(row.max(), 0.0)
        if sym:
            xmax = max(abs(xmin), xmax)
            if xmin < 0:
                xmin = -xmax
        if xmin == 0 and xmax == 0:
            xmin, xmax = -1.0, 1.0
        if sym:
            s = xmax / -minq
            z = 0.0
        else:
            s = np.float32((np.float32(xmax) - np.float32(xmin)) / np.float32(maxq))
            z = np.round(-xmin / s)
        scales.append(np.float32(s))
        zeros.append(np.float32(z))
    return np.array(scales, np.float32), np.array(zeros, np.float32)


def find_params_mse_oracle(x, bits, sym, num=100, norm=2.4):
    """Literal per-channel grid search (f32 like the jnp path)."""
    x = np.asarray(x, np.float32)
    minq, maxq = grid(bits, sym)
    rows = x.shape[0]
    scales = np.zeros(rows, np.float32)
    zeros = np.zeros(rows, np.float32)
    for r in range(rows):
        row = x[r]
        xmin = np.float32(min(row.min(), 0.0))
        xmax = np.float32(max(row.max(), 0.0))
        best = np.float32(1e10)
        if sym:
            xr = max(abs(xmin), xmax)
            best_max = xmax
            for i in range(1, num + 1):
                tmp_max = np.float32(xr / num * i)
                s = np.float32(max(tmp_max / -minq, EPS))
                xq = fake_quant(row, s, 0.0, minq, maxq)
                score = np.mean(np.abs(xq - row) ** np.float32(norm), dtype=np.float32)
                if score < best:
                    best_max = tmp_max
                best = min(best, score)
            s = np.float32(max(max(best_max, 0.0) / -minq, EPS))
            scales[r], zeros[r] = s, 0.0
        else:
            xr = np.float32(xmax - xmin)
            best_min, best_max = xmin, xmax
            for i in range(1, num + 1):
                tmp_max = np.float32(xr / num * i)
                delta = np.float32(max(tmp_max / (maxq - minq), EPS))
                x_round = np.round(row / delta)
                for zp in range(2 ** bits):
                    new_min = np.float32(-zp * delta)
                    new_max = np.float32(tmp_max - zp * delta)
                    z = np.clip(minq - np.round(new_min / delta), minq, maxq)
                    q = np.clip(x_round + z, minq, maxq)
                    xq = delta * (q - z)
                    score = np.mean(np.abs(xq - row) ** np.float32(norm), dtype=np.float32)
                    if score < best:
                        best_min, best_max = new_min, new_max
                    best = min(best, score)
            mn = min(best_min, 0.0)
            mx = max(best_max, 0.0)
            s = np.float32(max((mx - mn) / (maxq - minq), EPS))
            z = np.clip(minq - np.round(mn / s), minq, maxq)
            scales[r], zeros[r] = s, z
    return scales, zeros


def gptq_oracle(W, H, bits, sym, n_out, *, actorder=False, frob_norm=None,
                percdamp=0.01, blocksize=128, mse=True, num=100,
                groupsize=-1):
    """Literal GPTQ-OWQ reconstruction in float64-free numpy (f32-ish).

    Returns (Q, scale, zero, out_ids, ids) with Q in the original column
    order.  Semantics per SURVEY.md §2.1 / §3.1.
    """
    W = np.array(W, np.float64)
    H = np.array(H, np.float64)
    rows, cols = W.shape
    n_nonout = cols - n_out

    # --- outlier selection ------------------------------------------------
    hdiag = np.diag(H).copy()
    if frob_norm is not None:
        hdiag = hdiag * np.asarray(frob_norm, np.float64)
    desc = np.argsort(-hdiag, kind="stable")
    if n_out > 0:
        outliers = desc[:n_out]
        mask = np.ones(cols, bool)
        mask[outliers] = False
        if actorder:
            ids = np.concatenate([desc[n_out:], outliers])
        else:
            ids = np.concatenate([np.arange(cols)[mask], outliers])
        out_ids = np.sort(outliers)
    elif actorder:
        ids = desc
        out_ids = np.array([], np.int64)
    else:
        ids = np.arange(cols)
        out_ids = np.array([], np.int64)

    W = W[:, ids]
    H = H[np.ix_(ids, ids)]

    # --- quant params on the kept columns --------------------------------
    if mse:
        scale, zero = find_params_mse_oracle(W[:, :n_nonout], bits, sym, num=num)
    else:
        scale, zero = find_params_minmax_oracle(W[:, :n_nonout], bits, sym)
    scale = scale.astype(np.float64)
    zero = zero.astype(np.float64)
    minq, maxq = grid(bits, sym)

    # --- damped inverse-Cholesky -----------------------------------------
    dead = np.diag(H) == 0
    H[dead, dead] = 1.0
    W[:, dead] = 0.0
    damp = percdamp * np.mean(np.diag(H))
    H[np.arange(cols), np.arange(cols)] += damp
    Hinv = np.linalg.cholesky(np.linalg.inv(H)).T  # upper

    Q = W.copy()
    for i1 in range(0, n_nonout, blocksize):
        i2 = min(i1 + blocksize, n_nonout)
        W1 = W[:, i1:i2].copy()
        Err1 = np.zeros_like(W1)
        for i in range(i2 - i1):
            w = W1[:, i]
            d = Hinv[i1 + i, i1 + i]
            if groupsize != -1 and (i1 + i) % groupsize == 0:
                # Reference refits on W (NOT W1): the window's in-block
                # columns are as-of-block-start — no in-block error
                # feedback — and truncated at n_nonout (recon.py:135-137,
                # num=40).
                win = W[:, (i1 + i):min(i1 + i + groupsize, n_nonout)]
                if mse:
                    scale, zero = find_params_mse_oracle(win, bits, sym,
                                                         num=40)
                else:
                    scale, zero = find_params_minmax_oracle(win, bits, sym)
                scale = scale.astype(np.float64)
                zero = zero.astype(np.float64)
            q = fake_quant(w[:, None], scale[:, None], zero[:, None], minq, maxq)[:, 0]
            Q[:, i1 + i] = q
            err = (w - q) / d
            W1[:, i:] -= err[:, None] * Hinv[i1 + i, i1 + i:i2][None, :]
            Err1[:, i] = err
        W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:]

    if n_out > 0 or actorder:
        Q[:, n_nonout:] = W[:, n_nonout:]
        inv = np.argsort(ids)
        Q = Q[:, inv]
    return Q, scale, zero, out_ids.astype(np.int32), ids
