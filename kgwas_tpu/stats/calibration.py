"""Storey–Tibshirani binned FDR reweighting + scale-factor calibration.

Host-side numpy/pandas mirror of reference kgwas/eval_utils.py:11-28 and
:509-596 — including every edge-case quirk (pi0 clamping to [1e-5, 1-1e-5],
all-null/all-alternative bin reassignment, P_weighted>1 fallback to the
original P, and bisection returning the last midpoint on non-convergence),
because these quirks shape the output p-values the parity harness checks.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from scipy import interpolate


def find_closest_x(df_pred, lower_bound=0, upper_bound=200, tolerance=0.01):
    """Calibration scale factor via bisection (reference eval_utils.py:11-28):
    find x s.t. #(lower < x*P_weighted < upper) matches #(lower < P < upper)."""
    upper = 1e-2
    lower = 1e-3
    mid = (lower_bound + upper_bound) / 2
    pw = df_pred.P_weighted.values
    p = df_pred.P.values
    # res2 is loop-invariant; the reference divides by it each iteration and
    # crashes (ZeroDivisionError) when no GWAS p-value falls in the
    # calibration band (possible on small SNP sets). Deviation: fall back to
    # the neutral scale factor 1.0 instead of crashing.
    res2 = len(np.where((p < upper) & (p > lower))[0])
    if res2 == 0:
        return 1.0
    while lower_bound <= upper_bound:
        mid = (lower_bound + upper_bound) / 2
        res1 = len(np.where((pw * mid < upper) & (pw * mid > lower))[0])
        result = res1 / res2
        if abs(result - 1) < tolerance:
            return mid
        elif result > 1:
            lower_bound = mid + tolerance
        else:
            upper_bound = mid - tolerance
    return mid


def storey_pi_estimator(gwas_data, bin_index):
    """Storey & Tibshirani (PNAS 2003) pi0 estimator over one bin
    (reference eval_utils.py:509-537): lambda grid 0.05..0.90, cubic-spline
    extrapolated at the largest lambda, clipped at 1."""
    pvalue = gwas_data.loc[bin_index, "P"]
    total_tests = float(len(pvalue))
    pi0 = []
    lam = np.arange(0.05, 0.95, 0.05)
    counts = np.array([(pvalue > i).sum() for i in np.arange(0.05, 0.95, 0.05)])
    for l in range(len(lam)):
        pi0.append(counts[l] / (total_tests * (1 - lam[l])))

    if not np.all(np.isfinite(pi0)):
        finite_indices = np.isfinite(pi0)
        lam = lam[finite_indices]
        pi0 = np.asarray(pi0)[finite_indices]

    cubic_spline = interpolate.CubicSpline(lam, pi0)
    pi0_est = cubic_spline(lam[-1])
    if pi0_est > 1:
        pi0_est = 1
    return pi0_est


def storey_tibshirani_integrate(gwas_data, column="pred", num_bins=100):
    """Binned p-value reweighting (reference eval_utils.py:539-596; the
    reference misspells this 'storey_ribshirani_integrate').

    Bins SNPs by quantiles of ``column`` (the model's functional-relevance
    score), estimates pi0 per bin, reweights P by (1-pi0)/pi0 normalized to
    mean 1. Mutates gwas_data like the reference; returns P_weighted values.
    """
    num_bins = float(num_bins)
    quantiles = np.arange(0, 1 + 1 / (num_bins + 1), 1 / num_bins)
    pred_quantiles = gwas_data[column].quantile(quantiles)
    # expand extreme quantiles so everything falls inside a bin
    pred_quantiles[0] = pred_quantiles[0] - 1
    pred_quantiles[1] = pred_quantiles[1] + 1
    pred_quantiles = pred_quantiles.drop_duplicates()
    num_bins = len(pred_quantiles) - 1
    bins = pd.cut(gwas_data[column], pred_quantiles, labels=np.arange(num_bins))
    gwas_data["bin_number"] = bins

    gwas_data["pi0"] = None

    if (gwas_data["P"].min() < 0) or (gwas_data["P"].max() > 1):
        gwas_data["P"] = gwas_data["P"].clip(lower=0, upper=1)

    for i in range(num_bins):
        bin_index = gwas_data["bin_number"] == i
        if len(gwas_data[bin_index]) > 0:
            pi0 = storey_pi_estimator(gwas_data, bin_index)
            # prevent exploding weights
            if pi0 < 1e-5:
                pi0 = 1e-5
            if pi0 > 1 - 1e-5:
                pi0 = 1 - 1e-5
            gwas_data.loc[bin_index, "pi0"] = pi0
    if any(gwas_data["pi0"] == 1):  # all-null bin -> smallest non-null weight
        one_index = gwas_data["pi0"] == 1
        largest_pi0 = gwas_data.loc[~one_index]["pi0"].max()
        gwas_data.loc[one_index, "pi0"] = largest_pi0
    if any(gwas_data["pi0"] == 0):  # all-alternative bin -> largest non-null weight
        one_index = gwas_data["pi0"] == 0
        largest_pi0 = gwas_data.loc[~one_index]["pi0"].min()
        gwas_data.loc[one_index, "pi0"] = largest_pi0

    weights = (1 - gwas_data["pi0"]) / (gwas_data["pi0"])
    mean_weight = weights.mean()
    weights = weights / mean_weight  # normalize to mean 1

    gwas_data["weights"] = weights
    gwas_data["P_weighted"] = gwas_data["P"] / weights

    index = gwas_data["P_weighted"] > 1
    # use the original p-value when the reweighted one exceeds 1
    gwas_data.loc[index, "P_weighted"] = gwas_data["P"][index]
    gwas_data.loc[gwas_data["P_weighted"].isnull(), "P_weighted"] = 1
    return gwas_data["P_weighted"].values


# reference-compatible alias (typo preserved at reference eval_utils.py:539)
storey_ribshirani_integrate = storey_tibshirani_integrate


def finalize_predictions(lr_uni, pred):
    """The reference train() tail (reference kgwas/kgwas.py:186-212):
    attach per-SNP predictions, run the 500-bin Storey–Tibshirani
    reweighting on |pred|, calibrate with the find_closest_x scale factor,
    clip to [0, 1]. MUTATES lr_uni exactly as the reference does (adds
    pred/abs_pred/SR_P_val/SR columns) and returns
    (lr_uni_to_save, scale_factor) where lr_uni_to_save carries
    P_weighted and KGWAS_P. Extracted as a function so the chaining can be
    oracle-tested against the reference tail on identical inputs
    (tests/test_e2e_reference_pipeline.py)."""
    lr_uni["pred"] = pred
    lr_uni_to_save = lr_uni.copy(deep=True)

    lr_uni["abs_pred"] = np.abs(lr_uni["pred"])
    lr_uni["SR_P_val"] = storey_tibshirani_integrate(
        lr_uni, column="abs_pred", num_bins=500
    )
    lr_uni["SR"] = -(np.log10(lr_uni["SR_P_val"].astype(float).values))
    lr_uni_to_save["P_weighted"] = lr_uni["SR_P_val"]

    scale_factor = find_closest_x(lr_uni_to_save)
    lr_uni_to_save["KGWAS_P"] = scale_factor * lr_uni_to_save["P_weighted"]
    lr_uni_to_save["KGWAS_P"] = lr_uni_to_save["KGWAS_P"].clip(
        lower=0, upper=1
    )
    return lr_uni_to_save, scale_factor
