"""Frozen-fixture e2e parity: this framework's KGWAS.train() vs the
reference outputs captured by scripts/regen_golden_fixtures.py.

Unlike tests/test_e2e_reference_pipeline.py (which runs the reference LIVE
on the pyg_shim), this consumes a frozen artifact — so the day the fixture
is regenerated on a machine with REAL torch_geometric (provenance
pyg="real" in meta_json), this file validates the framework against real
PyG outputs with no shim in the loop. Same gates and tolerances as the
live oracle (documented there).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgwas_tpu import KGWAS, KGWAS_Data
from kgwas_tpu.engine.checkpoint import import_torch_state_dict

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "ref_pipeline_v1.npz")


@pytest.fixture(scope="module")
def fx():
    if not os.path.isfile(FIXTURE):
        pytest.skip("golden fixture absent — run "
                    "scripts/regen_golden_fixtures.py")
    z = np.load(FIXTURE)
    meta = json.loads(str(z["meta_json"]))
    assert meta["version"] == 1
    return z, meta


def _make_data(tmp, meta, seed):
    data = KGWAS_Data.from_synthetic(
        **meta["data"], seed=seed, data_path=os.path.join(tmp, f"d{seed}"))
    data.load_synthetic_gwas(seed=seed)
    data.process_gwas_file()
    data.prepare_split()
    return data


def _sd(z, prefix):
    return {k[len(prefix):]: z[k] for k in z.files if k.startswith(prefix)}


def test_golden_e2e_pipeline(fx, tmp_path):
    z, meta = fx
    e2e, model = meta["e2e"], meta["model"]
    data = _make_data(str(tmp_path), meta, e2e["seed"])

    run = KGWAS(data, exp_name="golden_e2e", seed=e2e["seed"])
    run.initialize_model(**model, use_pallas=False)
    params = import_torch_state_dict(
        _sd(z, "e2e_sd__"), num_layers=model["gnn_num_layers"])
    run.params = jax.tree_util.tree_map(jnp.asarray, params)
    run.best_params = run.params
    res = run.train(batch_size=e2e["bs"], epoch=e2e["epochs"], lr=e2e["lr"])

    order = {i: n for n, i in enumerate(res["ID"].values)}
    idx = np.array([order[i] for i in z["e2e_ids"]])
    pt = res["pred"].values.astype(np.float64)[idx]
    pr = z["e2e_pred"]
    np.testing.assert_allclose(pt, pr, rtol=2e-2, atol=1e-3)
    assert np.corrcoef(pt, pr)[0, 1] > 0.99999

    pw = res["P_weighted"].values.astype(np.float64)[idx]
    assert np.isclose(pw, z["e2e_P_weighted"], rtol=1e-9, atol=0).mean() > 0.7

    from scipy.stats import spearmanr

    p = res["KGWAS_P"].values.astype(np.float64)[idx]
    assert spearmanr(p, z["e2e_KGWAS_P"]).statistic > 0.97

    my_pred_all = run.predict_all(run.best_params)
    val_ids = np.asarray(data.val_mask)
    n_val_eval = (len(val_ids) // e2e["bs"]) * e2e["bs"]
    ids = val_ids[:n_val_eval] if n_val_eval else val_ids
    y = np.asarray(data.graph.node_labels["SNP"])
    my_best_val = float(np.corrcoef(my_pred_all[ids], y[ids])[0, 1])
    np.testing.assert_allclose(
        my_best_val, float(z["e2e_best_val_pearson"]), atol=5e-3)


def test_golden_loss_schedule(fx, tmp_path):
    z, meta = fx
    sched, model = meta["sched"], meta["model"]
    data = _make_data(str(tmp_path), meta, sched["seed"])

    run = KGWAS(data, exp_name="golden_sched", seed=sched["seed"])
    run.initialize_model(**model, use_pallas=False)
    run.params = jax.tree_util.tree_map(
        jnp.asarray,
        import_torch_state_dict(_sd(z, "sched_sd__"),
                                num_layers=model["gnn_num_layers"]))
    run.best_params = run.params
    run.train(batch_size=sched["bs"], epoch=1, lr=sched["lr"], scan_steps=0,
              metrics_log=None)
    my_losses = run.epoch_losses[0]
    ref_losses = z["sched_losses"]
    assert len(my_losses) == len(ref_losses) > 0
    np.testing.assert_allclose(my_losses, ref_losses, rtol=5e-4, atol=1e-6)
