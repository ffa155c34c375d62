"""UKBB cohort pipeline tests over fabricated mini raw files (QC filters,
kinship pruning, covariates, phenotype extraction — reference kgwas/data.py)."""
import os

import numpy as np
import pandas as pd
import pytest

from kgwas_tpu.cohort.ukbb import (
    get_fields,
    get_row_last_values,
    remove_kinships,
    ukbb_cohort,
)


@pytest.fixture()
def raw_ukbb(tmp_path):
    """Fabricate a small main-data CSV + kinship table."""
    n = 40
    rng = np.random.default_rng(0)
    eid = np.arange(1000, 1000 + n)
    df = pd.DataFrame({"eid": eid})
    # QC fields: default to passing values
    df["22006-0.0"] = 1.0              # white british
    df["22018-0.0"] = np.nan           # no relatedness exclusion
    df["22019-0.0"] = np.nan           # no aneuploidy
    df["31-0.0"] = rng.integers(0, 2, n).astype(float)
    df["22001-0.0"] = df["31-0.0"]     # sex match
    df["22010-0.0"] = np.nan           # quality ok
    # failures: 5 wrong ancestry, 3 sex-mismatch, 2 excluded
    df.loc[:4, "22006-0.0"] = 0.0
    df.loc[5:7, "22001-0.0"] = 1 - df.loc[5:7, "31-0.0"]
    df.loc[8:9, "22010-0.0"] = 1.0
    # phenotype field 50 with 2 visits (second visit only for half)
    df["50-0.0"] = rng.normal(170, 10, n)
    df["50-1.0"] = np.where(rng.random(n) < 0.5, rng.normal(171, 10, n), np.nan)
    main_path = tmp_path / "main.csv"
    df.to_csv(main_path, index=False)

    # kinship: eids 1015-1016 related, 1017-1018-1019 one group
    kin = pd.DataFrame(
        {"ID1": [1015, 1017, 1018], "ID2": [1016, 1018, 1019]}
    )
    kin_path = tmp_path / "kinship.dat"
    kin.to_csv(kin_path, index=False, sep=" ")
    return str(main_path), str(kin_path), str(tmp_path / "cohort"), df


def test_get_fields_selects_columns(raw_ukbb):
    main_path, _, _, df = raw_ukbb
    out = get_fields([50], main_path)
    assert list(out.columns) == ["eid", "50-0.0", "50-1.0"]


def test_get_row_last_values(raw_ukbb):
    main_path, _, _, df = raw_ukbb
    sub = df[["50-0.0", "50-1.0"]]
    last = get_row_last_values(sub)
    # rows with a second visit take it; others fall back to the first
    for i in range(len(df)):
        expected = (
            df["50-1.0"].iloc[i]
            if pd.notnull(df["50-1.0"].iloc[i])
            else df["50-0.0"].iloc[i]
        )
        assert last.iloc[i] == expected


def test_remove_kinships_keeps_lowest_eid(raw_ukbb):
    _, kin_path, _, df = raw_ukbb
    eid = pd.Series(np.arange(1000, 1040))
    mask = remove_kinships(eid, verbose=False, kinship_table_path=kin_path)
    kept = set(eid[mask])
    assert 1015 in kept and 1016 not in kept
    assert 1017 in kept and 1018 not in kept and 1019 not in kept


def test_cohort_qc_filters(raw_ukbb):
    main_path, kin_path, cohort_dir, df = raw_ukbb
    os.makedirs(cohort_dir, exist_ok=True)
    c = ukbb_cohort(main_path, cohort_dir, withdraw_path="/nonexistent",
                    keep_relatives=False, kinship_table_path=kin_path)
    # 40 - 5 ancestry - 3 sex-mismatch - 2 quality = 30, minus kinship drops
    # among survivors (1015..1019 all pass QC: 1016,1018,1019 dropped) = 27
    assert len(c.cohort) == 27
    assert 1000 not in c.cohort  # failed ancestry
    assert 1016 not in c.cohort  # kinship pruned

    # with relatives: 30
    c2 = ukbb_cohort(main_path, cohort_dir, withdraw_path="/nonexistent",
                     keep_relatives=True, kinship_table_path=kin_path)
    assert len(c2.cohort) == 30


def test_get_phenotype_aggregate_and_plink(raw_ukbb):
    main_path, kin_path, cohort_dir, df = raw_ukbb
    os.makedirs(cohort_dir, exist_ok=True)
    c = ukbb_cohort(main_path, cohort_dir, withdraw_path="/nonexistent",
                    keep_relatives=False, kinship_table_path=kin_path)
    pheno = c.get_phenotype(50, to_str=False)
    assert set(pheno.columns) == {"eid", "50"}
    assert pheno.eid.isin(c.cohort).all()
    # plink export: FID IID VALUE, no header
    plink = c.get_phenotype(50, to_plink=True, to_str=False)
    assert plink.shape[1] == 3
    assert (plink[0] == plink[1]).all()
