"""Statistics parity tests: run the REFERENCE implementation (loaded from
/root/reference source as a sealed oracle) against ours on random inputs —
bit-level parity of LDSC weights, Storey–Tibshirani reweighting, and the
calibration scale factor (SURVEY.md section 4 pyramid level 2)."""
import importlib.util
import types

import numpy as np
import pandas as pd
import pytest

from kgwas_tpu.stats import (
    find_closest_x,
    ldsc_regression_weights,
    storey_tibshirani_integrate,
)

REF = "/root/reference/kgwas"


def _load_ref_module(name, path, stub_imports=()):
    """Exec a reference module standalone with relative imports stubbed."""
    src = open(path).read()
    for rel in stub_imports:
        src = src.replace(rel, "# stubbed: " + rel)
    mod = types.ModuleType(name)
    mod.__dict__["load_dict"] = lambda p: None
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


@pytest.fixture(scope="module")
def ref_eval_utils():
    return _load_ref_module(
        "ref_eval_utils",
        f"{REF}/eval_utils.py",
        stub_imports=["from .utils import load_dict"],
    )


@pytest.fixture(scope="module")
def ref_utils_ldsc():
    # extract just the ldsc function: exec the def in isolation
    import re

    src = open(f"{REF}/utils.py").read()
    m = re.search(r"def ldsc_regression_weights.*?return w\n", src, re.S)
    ns = {"np": np}
    exec(m.group(0), ns)
    return ns["ldsc_regression_weights"]


def test_ldsc_weights_bitwise(ref_utils_ldsc):
    rng = np.random.default_rng(0)
    ld = rng.uniform(0.5, 120, 1000)
    w_ld = rng.uniform(0.2, 80, 1000)
    ours = ldsc_regression_weights(ld, w_ld, 10000, 15e6, 0.5)
    ref = ref_utils_ldsc(ld, w_ld, 10000, 15e6, 0.5)
    np.testing.assert_array_equal(ours, ref)


def _random_gwas(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(0, 1, n)
    p[: n // 20] = rng.uniform(0, 1e-6, n // 20)  # some hits
    pred = rng.standard_normal(n) ** 2
    return pd.DataFrame({"P": p, "pred": pred, "abs_pred": np.abs(pred)})


@pytest.mark.parametrize("num_bins", [50, 500])
def test_storey_tibshirani_parity(ref_eval_utils, num_bins):
    df_ref = _random_gwas()
    df_ours = df_ref.copy(deep=True)
    ref_out = ref_eval_utils.storey_ribshirani_integrate(
        df_ref, column="abs_pred", num_bins=num_bins
    )
    our_out = storey_tibshirani_integrate(
        df_ours, column="abs_pred", num_bins=num_bins
    )
    np.testing.assert_array_equal(
        np.asarray(ref_out, dtype=float), np.asarray(our_out, dtype=float)
    )


def test_find_closest_x_parity(ref_eval_utils):
    rng = np.random.default_rng(1)
    n = 5000
    df = pd.DataFrame(
        {"P": rng.uniform(0, 1, n), "P_weighted": rng.uniform(0, 1, n) * 0.3}
    )
    ours = find_closest_x(df)
    ref = ref_eval_utils.find_closest_x(df)
    assert ours == ref


def test_storey_pi_clamping_edge_cases():
    # a bin with all tiny p-values drives pi0 -> 0; clamps must kick in
    rng = np.random.default_rng(2)
    n = 2000
    df = pd.DataFrame(
        {
            "P": np.concatenate(
                [rng.uniform(0, 1e-8, n // 2), rng.uniform(0, 1, n // 2)]
            ),
            "abs_pred": np.concatenate(
                [rng.uniform(10, 11, n // 2), rng.uniform(0, 1, n // 2)]
            ),
        }
    )
    out = storey_tibshirani_integrate(df, column="abs_pred", num_bins=4)
    out = np.asarray(out, dtype=float)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0
    # P_weighted > 1 replaced by original P
    assert np.all(out <= 1.0 + 1e-12)


def test_residual_label_modes():
    """residual-* label variants (reference kgwas_data.py:449-512) — incl.
    the reference quirk of predicting from w_ld_score in every mode."""
    from kgwas_tpu.stats.labels import residual_label

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame(
        {
            "BETA": rng.standard_normal(n) * 0.1,
            "SE": rng.uniform(0.01, 0.1, n),
            "ld_score": rng.uniform(1, 100, n),
            "w_ld_score": rng.uniform(1, 60, n),
            "ld_weight": rng.uniform(0.1, 2.0, n),
        }
    )
    outs = {}
    for mode in ("residual-w-ld", "residual-ld", "residual-ld-ols",
                 "residual-ld-ols-abs", "residual-w-ld-ols"):
        y = residual_label(df, mode)
        assert np.all(np.isfinite(y)), mode
        outs[mode] = y
    assert np.all(outs["residual-ld-ols-abs"] >= 0)
    # ld vs w-ld fits differ
    assert not np.allclose(outs["residual-ld"], outs["residual-w-ld"])


def test_find_closest_x_empty_calibration_band():
    """No GWAS p-value in the (1e-3, 1e-2) band: the reference divides by
    zero here (eval_utils.py:20); we return the neutral scale factor."""
    import pandas as pd

    from kgwas_tpu.stats.calibration import find_closest_x

    df = pd.DataFrame({
        "P": [0.5, 0.9, 1e-8, 0.2],          # nothing in (1e-3, 1e-2)
        "P_weighted": [0.4, 0.8, 1e-9, 0.3],
    })
    assert find_closest_x(df) == 1.0


def test_plot_cluster_range_renders_headless(tmp_path):
    """plot_cluster_range (reference eval_utils.py:259-293): renders all four
    method rows headless, inserts empty entries for missing chromosomes into
    the caller's dicts (reference quirk), and respects x limits."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    from kgwas_tpu.stats import plot_cluster_range

    gnn = {1: [(100, 200), (500, 900)]}
    base = {1: [(120, 220)]}
    gold = {1: [(130, 210)]}
    findor = {}
    out = tmp_path / "clusters.png"
    fig = plot_cluster_range(1, gnn, base, gold, findor, x_start=0,
                             x_end=1000, show=False, save_path=str(out))
    assert out.exists() and out.stat().st_size > 0
    assert findor == {1: {}}  # reference quirk: caller dict mutated
    ax = fig.axes[0]
    assert ax.get_xlim() == (0.0, 1000.0)
    labels = {t.get_text() for t in ax.get_yticklabels()}
    assert {"GNN", "FastGWA", "GWAS Catalog"} <= labels
    import matplotlib.pyplot as plt
    plt.close(fig)
