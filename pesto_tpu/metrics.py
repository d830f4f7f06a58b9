"""Binary-classification metrics (host-side numpy/sklearn).

Reimplements the reference scoring semantics (src/scoring.py:10-96),
including its NaN rules, so benchmark numbers stay comparable:
  - ppv undefined (NaN) when no positives, npv when no negatives,
  - tpr/tnr/mcc NaN on division by zero,
  - roc_auc via sklearn, NaN for classes lacking both labels,
  - bc_scoring stacks [acc, ppv, npv, tpr, tnr, mcc, auc, std].
"""

import numpy as np

bc_score_names = ["acc", "ppv", "npv", "tpr", "tnr", "mcc", "auc", "std"]


def _counts(y, q):
    TP = np.sum(q * y, axis=0)
    TN = np.sum((1.0 - q) * (1.0 - y), axis=0)
    FP = np.sum(q * (1.0 - y), axis=0)
    FN = np.sum((1.0 - q) * y, axis=0)
    P = np.sum(y, axis=0)
    N = np.sum(1.0 - y, axis=0)
    return TP, TN, FP, FN, P, N


def _safe_div(a, b):
    with np.errstate(divide="ignore", invalid="ignore"):
        v = a / b
    return np.where(np.isinf(v), np.nan, v)


def roc_auc(y, p, P, N):
    from sklearn.metrics import roc_auc_score

    m = (P > 0) & (N > 0)
    v = np.full(y.shape[1], np.nan, dtype=np.float32)
    if np.any(m):
        a = np.array(roc_auc_score(y[:, m], p[:, m], average=None), ndmin=1)
        v[m] = a.astype(np.float32)
    return v


def nanmean(x, axis=0):
    with np.errstate(invalid="ignore"):
        return np.nansum(x, axis=axis) / np.sum(~np.isnan(x), axis=axis)


def bc_scoring(y, p):
    """y, p: [N, C] -> scores [8, C] (reference src/scoring.py:77-96)."""
    y = np.asarray(y, dtype=np.float32)
    p = np.asarray(p, dtype=np.float32)
    q = np.round(p)
    TP, TN, FP, FN, P, N = _counts(y, q)

    acc = _safe_div(TP + TN, TP + TN + FP + FN)
    ppv = _safe_div(TP, TP + FP)
    ppv = np.where(P > 0, ppv, np.nan)
    npv = _safe_div(TN, TN + FN)
    npv = np.where(N > 0, npv, np.nan)
    tpr = _safe_div(TP, TP + FN)
    tnr = _safe_div(TN, TN + FP)
    with np.errstate(invalid="ignore"):
        mcc = _safe_div(TP * TN - FP * FN, np.sqrt((TP + FP) * (TP + FN) * (TN + FP) * (TN + FN)))
    auc = roc_auc(y, p, P, N)
    # single-sample std is NaN (torch unbiased std semantics) so nanmean
    # aggregation excludes it, exactly like the reference
    std = np.std(p, axis=0, ddof=1) if p.shape[0] > 1 else np.full(p.shape[1], np.nan)

    return np.stack([acc, ppv, npv, tpr, tnr, mcc, auc, std]).astype(np.float32)


def reg_scoring(y, p):
    from scipy.stats import pearsonr

    y = np.asarray(y, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    return {
        "mse": float(np.mean((y - p) ** 2)),
        "mae": float(np.mean(np.abs(y - p))),
        "rmse": float(np.sqrt(np.mean((y - p) ** 2))),
        "pcc": float(pearsonr(y, p)[0]) if not np.allclose(y, y.flat[0]) else float("nan"),
        "std": float(np.std(p, ddof=1)),
    }
