"""Golden-output regression: the full synthetic pipeline's per-SNP
predictions and KGWAS_P values are frozen to catch silent numeric drift
across refactors (CPU float32, matmul_precision=highest — deterministic).

Regenerate intentionally with:  KGWAS_TPU_REGEN_GOLDEN=1 pytest tests/test_golden.py
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "e2e_v1.npz")


def _run_pipeline(tmp_dir):
    from kgwas_tpu import KGWAS, KGWAS_Data

    data = KGWAS_Data.from_synthetic(
        n_snp=250, n_gene=50, n_go=18, seed=123, data_path=tmp_dir
    )
    data.load_synthetic_gwas(seed=123)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name="golden", seed=123)
    run.initialize_model(gnn_hidden_dim=16, gnn_num_layers=2)
    res = run.train(batch_size=64, epoch=2, lr=1e-3, save_best_model=False)
    return res


def test_e2e_outputs_match_golden(tmp_path):
    res = _run_pipeline(str(tmp_path))
    pred = res.pred.values.astype(np.float64)
    kgwas_p = res.KGWAS_P.values.astype(np.float64)

    if os.environ.get("KGWAS_TPU_REGEN_GOLDEN") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, pred=pred, kgwas_p=kgwas_p)
        pytest.skip("golden file (re)generated")

    z = np.load(GOLDEN)
    np.testing.assert_allclose(pred, z["pred"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(kgwas_p, z["kgwas_p"], rtol=1e-5, atol=1e-8)
