"""CLI subcommands (kgwas_tpu/cli.py) driven hermetically on synthetic data.

The reference has no CLI; these lock the train -> predict -> interpret
artifact contract at the command surface.
"""
import os

import numpy as np
import pytest

from kgwas_tpu.cli import main


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory, capsys_disabled=None):
    d = str(tmp_path_factory.mktemp("cli_data"))
    main([
        "train", "--synthetic", "--data-path", d, "--name", "cli_t",
        "--hidden", "16", "--epochs", "1", "--batch-size", "256",
        "--seed", "7",
    ])
    return d


def test_cli_train_artifacts(trained_dir, capsys):
    model_dir = os.path.join(trained_dir, "model", "cli_t")
    assert os.path.exists(os.path.join(model_dir, "model.npz"))
    assert os.path.exists(os.path.join(model_dir, "config.pkl"))
    assert os.path.exists(os.path.join(model_dir, "pred.csv"))


def test_cli_predict(trained_dir, tmp_path, capsys):
    out = str(tmp_path / "preds.npy")
    main([
        "predict", "--synthetic", "--data-path", trained_dir,
        "--name", "cli_t", "--seed", "7", "--out", out,
    ])
    pred = np.load(out)
    assert pred.shape == (2000,)
    assert np.all(np.isfinite(pred))


def test_cli_interpret(trained_dir, tmp_path, capsys):
    out = str(tmp_path / "dcn.csv")
    main([
        "interpret", "--synthetic", "--data-path", trained_dir,
        "--name", "cli_t", "--seed", "7",
        "--variant-threshold", "0.5", "--out", out,
    ])
    import pandas as pd

    dcn = pd.read_csv(out)
    assert len(dcn) > 0


def test_cli_train_mesh_flag(tmp_path, capsys):
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    d = str(tmp_path)
    main([
        "train", "--synthetic", "--data-path", d, "--name", "cli_m",
        "--hidden", "16", "--epochs", "1", "--batch-size", "256",
        "--seed", "7", "--mesh", "8",
    ])
    assert os.path.exists(os.path.join(d, "model", "cli_m", "pred.csv"))
