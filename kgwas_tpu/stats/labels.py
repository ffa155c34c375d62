"""Label construction variants for GWAS chi-square regression targets.

The 'chi' path lives inline in KGWAS_Data.process_gwas_file; the residual-*
variants (reference kgwas/kgwas_data.py:449-512) regress chi2 on LD scores
and train on the residual. The reference uses statsmodels WLS/OLS; here the
closed-form weighted least squares is solved directly (identical estimates).
"""
from __future__ import annotations

import numpy as np


def _wls_params(x: np.ndarray, y: np.ndarray, weights=None):
    """Weighted least squares y ~ 1 + x. Returns (intercept, slope) equal to
    statsmodels WLS(y, add_constant(x), weights).fit().params."""
    X = np.column_stack([np.ones_like(x, dtype=float), x.astype(float)])
    if weights is None:
        w = np.ones_like(y, dtype=float)
    else:
        w = np.asarray(weights, dtype=float)
    Xw = X * w[:, None]
    beta = np.linalg.solve(X.T @ Xw, Xw.T @ y.astype(float))
    return beta[0], beta[1]


def residual_label(lr_uni, mode: str) -> np.ndarray:
    y = (lr_uni["BETA"] / lr_uni["SE"]).values ** 2
    y = np.nan_to_num(y, nan=0.0)

    if mode in ("residual-w-ld", "residual-w-ld-ols"):
        X = lr_uni.w_ld_score.values
    else:
        X = lr_uni.ld_score.values

    if mode in ("residual-w-ld", "residual-ld"):
        b0, b1 = _wls_params(X, y, lr_uni.ld_weight.values)
    else:
        b0, b1 = _wls_params(X, y)

    # NOTE: the reference predicts from w_ld_score in every mode — even the
    # ld_score-fit ones (reference kgwas_data.py:461,475,487,499,511). Kept
    # for parity.
    y_pred = b0 + b1 * lr_uni.w_ld_score.values
    resid = y - y_pred
    if mode == "residual-ld-ols-abs":
        return np.abs(resid)
    return resid


def bonferroni(p_values, alpha: float = 0.05):
    """Bonferroni-corrected p-values (replaces statsmodels multipletests
    method='bonferroni' used at reference utils.py:556-559)."""
    p = np.asarray(p_values, dtype=float)
    return np.minimum(p * len(p), 1.0)
