"""External tool wrappers: command construction + output parsing, exercised
against mock PLINK2/gcta64/MAGMA binaries (shell scripts that validate argv
and emit reference-format outputs)."""
import os
import stat

import numpy as np
import pandas as pd
import pytest

from kgwas_tpu.external.gwas_runner import (
    GwasToolConfig,
    run_classic_gwas,
    select_engine,
)


def _mock_binary(path, script):
    with open(path, "w") as f:
        f.write("#!/bin/bash\n" + script)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return str(path)


def test_select_engine_rules():
    # reference classic_gwas_eval.py:109-121: PLINK for N<=3000 or binary
    assert select_engine(3000, False) == "plink"
    assert select_engine(5000, True) == "plink"
    assert select_engine(5000, False) == "fastgwa"


def test_plink_path_parses_linear_output(tmp_path):
    result_dir = tmp_path / "results"
    result_dir.mkdir()
    out_content = (
        "#CHROM\tPOS\tID\tREF\tALT\tA1\tTEST\tOBS_CT\tBETA\tSE\tT_STAT\tP\n"
        "1\t100\trs1\tA\tG\tG\tADD\t2000\t0.1\t0.05\t2.0\t0.045\n"
        "2\t200\trs2\tA\tG\tG\tADD\t2000\t-0.02\t0.04\t-0.5\t0.61\n"
    )
    plink = _mock_binary(
        tmp_path / "plink2",
        # write the expected output file based on --out argument
        'while [[ $# -gt 0 ]]; do if [[ "$1" == "--out" ]]; then OUT="$2"; fi; '
        "shift; done\n"
        f'printf "{out_content.replace(chr(10), "\\n")}" > '
        '"${OUT}.PHENO1.glm.linear"\n',
    )
    cfg = GwasToolConfig(
        bfile="/fake/bfile", result_dir=str(result_dir), plink2_bin=plink
    )
    df = run_classic_gwas(cfg, "/fake/pheno.txt", "test_run", sample_size=2000)
    assert list(df.ID) == ["rs1", "rs2"]
    assert "P" in df.columns


def test_fastgwa_path_parses_and_renames(tmp_path):
    result_dir = tmp_path / "results"
    result_dir.mkdir()
    out_content = (
        "CHR\tSNP\tPOS\tA1\tA2\tN\tAF1\tBETA\tSE\tP\n"
        "1\t rs1\t100\tA\tG\t5000\t0.3\t0.1\t0.05\t0.045\n"
    ).replace(" ", "")
    gcta = _mock_binary(
        tmp_path / "gcta64",
        'while [[ $# -gt 0 ]]; do if [[ "$1" == "--out" ]]; then OUT="$2"; fi; '
        "shift; done\n"
        f'printf "{out_content.replace(chr(10), "\\n")}" > "${{OUT}}.fastGWA"\n',
    )
    cfg = GwasToolConfig(
        bfile="/fake/bfile",
        result_dir=str(result_dir),
        gcta_bin=gcta,
        grm_sparse="/fake/grm",
    )
    df = run_classic_gwas(cfg, "/fake/pheno.txt", "fg_run", sample_size=5000)
    # fastGWA columns renamed to the canonical frame (reference kgwas_data.py:326)
    assert "#CHROM" in df.columns and "ID" in df.columns


def test_fastgwa_requires_grm(tmp_path):
    cfg = GwasToolConfig(bfile="/fake", result_dir=str(tmp_path))
    with pytest.raises(ValueError):
        from kgwas_tpu.external.gwas_runner import run_fastgwa

        run_fastgwa(cfg, "/fake/pheno", "x")


def test_magma_wrapper(tmp_path):
    """run_magma writes SNP,P input and invokes the binary with the reference
    argv layout (reference kgwas.py:237-243)."""
    from kgwas_tpu.external.magma import run_magma

    magma = _mock_binary(
        tmp_path / "magma",
        'echo "MAGMA mock ran with: $@"\nexit 0\n',
    )
    annot = tmp_path / "gene_annotation.genes.annot"
    annot.write_text("fake annot")

    class FakeData:
        def _download_with_progress(self, url, path):  # pragma: no cover
            raise AssertionError("should not download; annot exists")

    class FakeRun:
        data_path = str(tmp_path)
        save_name = "magma_test"
        data = FakeData()
        kgwas_res = pd.DataFrame(
            {"ID": ["rs1", "rs2"], "KGWAS_P": [0.01, 0.5], "N": [5000, 5000]}
        )

    out_prefix = run_magma(FakeRun(), magma, "/fake/bfile")
    magma_input = os.path.join(
        str(tmp_path), "model_pred", "new_experiments", "magma_test_magma_format.csv"
    )
    assert os.path.exists(magma_input)
    df = pd.read_csv(magma_input, sep="\t")
    assert list(df.columns) == ["SNP", "P"]
    assert out_prefix.endswith("magma_test_magma_out")
