"""Label construction variants for GWAS chi-square regression targets.

The 'chi' path lives inline in KGWAS_Data.process_gwas_file; the residual-*
variants (reference kgwas/kgwas_data.py:449-512) regress chi2 on LD scores
and train on the residual.
"""
from __future__ import annotations

import numpy as np


def residual_label(lr_uni, mode: str) -> np.ndarray:
    import statsmodels.api as sm

    y = (lr_uni["BETA"] / lr_uni["SE"]).values ** 2
    y = np.nan_to_num(y, nan=0.0)

    if mode in ("residual-w-ld", "residual-w-ld-ols"):
        X = lr_uni.w_ld_score.values
    else:
        X = lr_uni.ld_score.values

    Xc = sm.add_constant(X)
    if mode in ("residual-w-ld", "residual-ld"):
        weights = lr_uni.ld_weight.values
        results = sm.WLS(y, Xc, weights=weights).fit()
    else:
        results = sm.OLS(y, Xc).fit()

    # NOTE: the reference predicts from w_ld_score in every mode — even the
    # ld_score-fit ones (reference kgwas_data.py:461,475,487,499,511). Kept
    # for parity.
    y_pred = results.params[0] + results.params[1] * lr_uni.w_ld_score.values
    resid = y - y_pred
    if mode == "residual-ld-ols-abs":
        return np.abs(resid)
    return resid
