"""End-to-end engine tests: the minimum slice of the reference demo workflow
(reference demo/kgwas_101.ipynb) on synthetic data — load KG, load GWAS,
process, split, train, KGWAS_P output, checkpoint round-trip."""
import os

import numpy as np
import pytest

from kgwas_tpu import KGWAS, KGWAS_Data


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("synth_data"))
    data = KGWAS_Data.from_synthetic(
        n_snp=300, n_gene=60, n_go=20, seed=7, data_path=data_dir
    )
    data.load_synthetic_gwas(seed=7)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name="test_run", seed=7)
    run.initialize_model(gnn_hidden_dim=16, gnn_num_layers=2)
    run.train(batch_size=64, epoch=2, lr=1e-3)
    return run


def test_split_counts(trained_run):
    data = trained_run.data
    n = len(data.all_mask)
    assert len(data.test_mask) == round(0.05 * n)
    assert len(data.train_mask) + len(data.val_mask) + len(data.test_mask) == n
    # disjoint
    assert not set(data.train_mask) & set(data.val_mask)
    assert not set(data.train_mask) & set(data.test_mask)


def test_kgwas_res_columns_and_ranges(trained_run):
    res = trained_run.kgwas_res
    for col in ("pred", "P_weighted", "KGWAS_P", "P", "ID"):
        assert col in res.columns, col
    assert res.KGWAS_P.min() >= 0
    assert res.KGWAS_P.max() <= 1
    assert np.all(np.isfinite(res.P_weighted.values.astype(float)))
    # final head is ReLU -> preds non-negative
    assert res.pred.min() >= 0


def test_pred_csv_written(trained_run):
    path = os.path.join(
        trained_run.data_path, "model_pred", "new_experiments", "test_run_pred.csv"
    )
    assert os.path.exists(path)
    import pandas as pd

    df = pd.read_csv(path, sep="\t")
    assert len(df) == len(trained_run.kgwas_res)


def test_training_changes_params_and_history(trained_run):
    hist = trained_run.train_history
    assert len(hist) == 2
    assert all(np.isfinite(h["val_pearsonr"]) for h in hist)
    assert all(h["epoch_time_s"] > 0 for h in hist)


def test_checkpoint_roundtrip(trained_run):
    import jax

    path = os.path.join(trained_run.data_path, "model", "test_run")
    assert os.path.exists(os.path.join(path, "model.npz"))
    assert os.path.exists(os.path.join(path, "config.pkl"))
    assert os.path.exists(os.path.join(path, "pred.csv"))

    run2 = KGWAS(trained_run.data, exp_name="reload", seed=7)
    run2.load_pretrained(path)
    # same predictions from reloaded params
    p1 = trained_run.predict_all()
    p2 = run2.predict_all()
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-7)
    assert run2.config == trained_run.config


def test_early_stop_keeps_best(trained_run):
    # best_params must reproduce the best recorded val pearson
    from kgwas_tpu.utils import compute_metrics

    data = trained_run.data
    cg = data.compile()
    pred = trained_run.predict_all(trained_run.best_params)
    y = data.graph.node_labels["SNP"]
    val_ids = np.asarray(data.val_mask)
    m = compute_metrics({"pred": pred[val_ids], "truth": y[val_ids]})
    best_hist = max(h["val_pearsonr"] for h in trained_run.train_history)
    np.testing.assert_allclose(m["pearsonr"], best_hist, rtol=1e-5)


def test_interpretation_pipeline(trained_run):
    df_net, df_var, dcn = trained_run.get_disease_critical_network(
        variant_threshold=0.5
    )
    assert set(
        ["h_idx", "t_idx", "weight", "h_type", "rel_type", "t_type", "layer"]
    ) <= set(df_net.columns)
    assert set(df_net.layer.unique()) == {"l1", "l2"}
    # all 5 node types participate
    assert "SNP" in df_net.t_type.values
    if len(dcn):
        assert set(dcn.Category.unique()) <= {"V2G", "G2G", "G2P"}
        # rev_ prefixes stripped in V2G
        assert not any(r.startswith("rev_") for r in dcn.rel_type.values)


def test_checkpoint_resume(tmp_path):
    """Orbax async train-state checkpointing + resume (new aux subsystem)."""
    import numpy as np

    from kgwas_tpu import KGWAS, KGWAS_Data

    data = KGWAS_Data.from_synthetic(
        n_snp=200, n_gene=40, n_go=15, seed=3, data_path=str(tmp_path)
    )
    data.load_synthetic_gwas(seed=3)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name="ckpt_run", seed=3)
    run.initialize_model(gnn_hidden_dim=8)
    run.train(batch_size=32, epoch=1, checkpoint_every=2, save_best_model=False)

    import os

    ckpt_dir = os.path.join(str(tmp_path), "model", "ckpt_run", "train_state")
    from kgwas_tpu.engine.checkpoint import latest_train_state, restore_train_state

    latest = latest_train_state(ckpt_dir)
    assert latest is not None
    # restored state drives a resumed run
    run2 = KGWAS(data, exp_name="ckpt_run", seed=3)
    run2.initialize_model(gnn_hidden_dim=8)
    run2.train(batch_size=32, epoch=1, resume=True, save_best_model=False)
    assert np.isfinite(run2.train_history[-1]["loss"])


def test_train_options_bf16_remat_shuffle(tmp_path):
    """TPU speed knobs (bfloat16 compute, remat, shuffled batches) run and
    produce finite outputs."""
    import numpy as np

    from kgwas_tpu import KGWAS, KGWAS_Data

    data = KGWAS_Data.from_synthetic(
        n_snp=150, n_gene=40, n_go=15, seed=9, data_path=str(tmp_path)
    )
    data.load_synthetic_gwas(seed=9)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name="knobs", seed=9)
    run.initialize_model(
        gnn_hidden_dim=16,
        compute_dtype="bfloat16",
        matmul_precision="default",
        remat=True,
    )
    res = run.train(batch_size=64, epoch=1, shuffle=True, save_best_model=False)
    assert np.all(np.isfinite(res.pred.values))
    assert np.all(np.isfinite(res.KGWAS_P.values.astype(float)))


def test_persistent_compilation_cache(tmp_path, monkeypatch):
    """enable_persistent_compilation_cache points jax at the requested dir,
    is idempotent, and honors the empty-env-var opt-out."""
    import jax

    from kgwas_tpu import utils

    monkeypatch.setattr(utils, "_CACHE_ENABLED", False)
    cache_dir = str(tmp_path / "xla_cache")
    utils.enable_persistent_compilation_cache(cache_dir)
    assert jax.config.jax_compilation_cache_dir == cache_dir
    assert utils._CACHE_ENABLED
    # second call (e.g. a second KGWAS instance) is a no-op
    utils.enable_persistent_compilation_cache(str(tmp_path / "other"))
    assert jax.config.jax_compilation_cache_dir == cache_dir

    # opt-out: empty KGWAS_TPU_CACHE_DIR leaves config untouched
    monkeypatch.setattr(utils, "_CACHE_ENABLED", False)
    monkeypatch.setenv("KGWAS_TPU_CACHE_DIR", "")
    utils.enable_persistent_compilation_cache()
    assert not utils._CACHE_ENABLED


def test_train_multihead(tmp_path):
    """gat_num_head=2 end to end through the engine (a config the reference
    crashes on — see tests/test_model.py multihead test)."""
    import numpy as np

    from kgwas_tpu import KGWAS, KGWAS_Data

    data = KGWAS_Data.from_synthetic(
        n_snp=150, n_gene=40, n_go=15, seed=11, data_path=str(tmp_path)
    )
    data.load_synthetic_gwas(seed=11)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name="mh", seed=11)
    run.initialize_model(gnn_hidden_dim=16, gat_num_head=2)
    res = run.train(batch_size=64, epoch=1, save_best_model=False)
    assert np.all(np.isfinite(res.pred.values))


def test_train_with_mesh_matches_single_device(tmp_path):
    """KGWAS.train(mesh=8): engine-level multi-chip training produces the
    same losses as single-device (GSPMD partitioning; fast-path selection is
    covered by tests/test_merged_shard.py)."""
    import jax
    import numpy as np

    from kgwas_tpu import KGWAS, KGWAS_Data

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    def make_run(tag):
        data = KGWAS_Data.from_synthetic(
            n_snp=200, n_gene=50, n_go=16, seed=17,
            data_path=str(tmp_path / tag),
        )
        data.load_synthetic_gwas(seed=17)
        data.process_gwas_file()
        data.prepare_split()
        run = KGWAS(data, exp_name=tag, seed=17)
        run.initialize_model(gnn_hidden_dim=16)
        return run

    r1 = make_run("single")
    r1.train(batch_size=64, epoch=2, save_best_model=False)
    r2 = make_run("mesh")
    r2.train(batch_size=64, epoch=2, save_best_model=False, mesh=8)
    l1 = [h["loss"] for h in r1.train_history]
    l2 = [h["loss"] for h in r2.train_history]
    np.testing.assert_allclose(l1, l2, rtol=1e-4)
    np.testing.assert_allclose(
        [h["val_mse"] for h in r1.train_history],
        [h["val_mse"] for h in r2.train_history], rtol=1e-4,
    )


def test_resolve_mesh_forms(tmp_path):
    """KGWAS._resolve_mesh accepts None/int/dict/Mesh and rejects garbage."""
    import jax
    import pytest
    from jax.sharding import Mesh

    from kgwas_tpu import KGWAS, KGWAS_Data

    data = KGWAS_Data.from_synthetic(
        n_snp=100, n_gene=30, n_go=10, seed=23, data_path=str(tmp_path)
    )
    run = KGWAS(data, exp_name="rm", seed=23)
    assert run._resolve_mesh(None) is None
    if jax.device_count() >= 8:
        m = run._resolve_mesh(8)
        assert isinstance(m, Mesh) and m.shape["data"] == 8
        m2 = run._resolve_mesh({"data": 4, "model": 2})
        assert m2.shape["model"] == 2
        assert run._resolve_mesh(m2) is m2
    with pytest.raises(TypeError, match="mesh must be"):
        run._resolve_mesh("everything")


def test_scan_dispatch_matches_per_step(tmp_path):
    """KGWAS.train(scan_steps=8) (lax.scan multi-step dispatch) produces the
    same training trajectory as per-step dispatch (scan_steps=0): identical
    epoch losses and final predictions."""
    runs = {}
    for tag, scan in [("per_step", 0), ("scan", 8)]:
        data = KGWAS_Data.from_synthetic(
            n_snp=300, n_gene=60, n_go=20, seed=11,
            data_path=str(tmp_path / tag) + "/",
        )
        data.load_synthetic_gwas(seed=11)
        data.process_gwas_file()
        data.prepare_split()
        run = KGWAS(data, exp_name=f"scan_{tag}", seed=11)
        run.initialize_model(gnn_hidden_dim=16, gnn_num_layers=2,
                             no_relu=True)
        run.train(batch_size=64, epoch=2, lr=1e-3, scan_steps=scan,
                  save_best_model=False)
        runs[tag] = run

    l_a = [h["loss"] for h in runs["per_step"].train_history]
    l_b = [h["loss"] for h in runs["scan"].train_history]
    np.testing.assert_allclose(l_b, l_a, rtol=1e-5)
    p_a = np.asarray(runs["per_step"].predict_all())
    p_b = np.asarray(runs["scan"].predict_all())
    np.testing.assert_allclose(p_b, p_a, rtol=1e-4, atol=1e-5)


def test_engine_layout_operands_matches_default(tmp_path):
    """KGWAS.train with cfg.layout_operands=True (operand-form layout
    bundles merged into the device arrays by _device_state) reproduces
    the default path's losses exactly at small scale."""
    import jax

    from kgwas_tpu import KGWAS, KGWAS_Data

    def run(lo, exp):
        data = KGWAS_Data.from_synthetic(
            n_snp=600, n_gene=200, n_go=60, seed=7,
            data_path=str(tmp_path / exp))
        data.load_synthetic_gwas(seed=7)
        data.process_gwas_file()
        data.prepare_split()
        run = KGWAS(data, exp_name=exp, seed=7)
        run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=32,
                             no_relu=True, use_pallas=True,
                             gather_chunk_rows=256, layout_operands=lo)
        run.train(batch_size=64, epoch=2, lr=1e-3, save_best_model=False)
        return [h["loss"] for h in run.train_history]

    base = run(False, "lo_off")
    lo = run(True, "lo_on")
    assert base == lo, (base, lo)
