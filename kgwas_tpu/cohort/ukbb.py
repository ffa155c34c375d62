"""UKBB cohort construction (host-side pandas; no device code).

Functional mirror of reference kgwas/data.py:16-426 (ukbb_cohort): sample QC
(ancestry / relatedness / aneuploidy / sex-mismatch / data-quality filters),
kinship-group pruning via sparse connected components, covariate assembly
(sex, age, PCA, assessment center, genotyping batch), phenotype extraction
(raw field, external trait file, ICD10 one-hot), and PLINK-format export.
Paths come from kgwas_tpu.params (env-var overridable instead of the
reference's hardcoded cluster paths, reference params.py:1-8).
"""
from __future__ import annotations

import os
from typing import List, Optional, Set

import numpy as np
import pandas as pd

from ..params import fam_path, kinship_path
from ..utils import load_dict, print_sys, save_dict

BINARY_TRAITS = [
    "body_BALDING1",
    "cancer_BREAST",
    "disease_ALLERGY_ECZEMA_DIAGNOSED",
    "disease_HYPOTHYROIDISM_SELF_REP",
    "other_MORNINGPERSON",
    "pigment_SUNBURN",
]

# UKBB QC field ids (reference data.py:44-67)
F_ANCESTRY = "22006-0.0"       # genetic ethnic grouping (white british == 1)
F_RELATED_EXCL = "22018-0.0"   # genetic relatedness exclusions
F_ANEUPLOIDY = "22019-0.0"     # sex chromosome aneuploidy
F_SEX_SELF = "31-0.0"          # self-reported sex
F_SEX_GENETIC = "22001-0.0"    # genetically determined sex
F_QUALITY = "22010-0.0"        # recommended genomic analysis exclusions


def get_fields(all_field_ids: List[int], main_data_path: str) -> pd.DataFrame:
    """Load only the columns of the requested UKBB field ids
    (reference kgwas/utils.py:108-112)."""
    headers = pd.read_csv(main_data_path, nrows=1).columns
    keep = [
        i
        for i, h in enumerate(headers)
        if h == "eid" or any(h.startswith(f"{fid}-") for fid in all_field_ids)
    ]
    return pd.read_csv(main_data_path, usecols=keep)


def get_row_last_values(df: pd.DataFrame) -> pd.Series:
    """Latest non-null measurement per row (reference utils.py:115-122)."""
    result = pd.Series(np.nan, index=df.index)
    for column in df.columns[::-1]:
        result = result.where(pd.notnull(result), df[column])
    return result


def get_kinship_groups(kinship_table_path: Optional[str] = None) -> List[Set]:
    """Kinship groups = connected components of the UKBB kinship graph
    (reference utils.py:153-178), via scipy sparse CSR."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components

    kinship_table = pd.read_csv(kinship_table_path or kinship_path, sep=" ")
    ids = np.array(sorted(set(kinship_table["ID1"]) | set(kinship_table["ID2"])))
    n = len(ids)
    id_to_index = pd.Series(np.arange(n), index=ids)

    i1 = kinship_table["ID1"].map(id_to_index).values
    i2 = kinship_table["ID2"].map(id_to_index).values
    rows = np.concatenate([i1, i2])
    cols = np.concatenate([i2, i1])
    mat = csr_matrix(
        (np.ones(len(rows), dtype=bool), (rows, cols)), shape=(n, n), dtype=bool
    )
    _, labels = connected_components(mat, directed=False)
    labels = pd.Series(labels, index=ids)
    return [set(grp.index) for _, grp in labels.groupby(labels)]


def remove_kinships(eid: pd.Series, verbose=True, kinship_table_path=None):
    """Keep one representative (lowest eid) per kinship group
    (reference utils.py:124-151). Returns a boolean keep-mask."""
    all_eids = set(eid)
    groups = get_kinship_groups(kinship_table_path)
    relevant = [g & all_eids for g in groups]
    relevant = [g for g in relevant if len(g) >= 2]
    if relevant:
        dropped = set.union(*[set(sorted(g)[1:]) for g in relevant])
    else:
        dropped = set()
    mask = ~eid.isin(dropped)
    if verbose:
        print_sys(
            f"{len(relevant)} kinship groups relevant; removing "
            f"{len(dropped)} samples, {len(mask)} -> {mask.sum()}"
        )
    return mask


class ukbb_cohort:
    def __init__(
        self,
        main_data_path,
        cohort_data_path,
        withdraw_path,
        keep_relatives: bool = False,
        kinship_table_path: Optional[str] = None,
    ):
        self.keep_relatives = keep_relatives
        self.cohort_data_path = cohort_data_path
        self.main_data_path = main_data_path
        self.kinship_table_path = kinship_table_path

        name = "cohort_with_relatives.pkl" if keep_relatives else "cohort_no_relatives.pkl"
        cohort_path = os.path.join(cohort_data_path, name)

        if not os.path.exists(cohort_path):
            print_sys("construct from scratch...")
            df_main = get_fields([22006, 22018, 22019, 22001, 22010, 31],
                                 main_data_path)
            steps = [
                ("white british ancestry (22006)", lambda d: d[d[F_ANCESTRY] == 1]),
                ("relatedness exclusions (22018)",
                 lambda d: d[d[F_RELATED_EXCL].isnull()]),
                ("sex chromosome aneuploidy (22019)",
                 lambda d: d[d[F_ANEUPLOIDY].isnull()]),
                ("sex mismatch (31 vs 22001)",
                 lambda d: d[d[F_SEX_SELF] == d[F_SEX_GENETIC]]),
                ("genomic data quality (22010)",
                 lambda d: d[d[F_QUALITY].isnull()]),
            ]
            print_sys(f"Total sample size: {len(df_main)}")
            for desc, fn in steps:
                before = len(df_main)
                df_main = fn(df_main)
                print_sys(f"{desc}: {before} -> {len(df_main)}")

            os.makedirs(cohort_data_path, exist_ok=True)
            save_dict(
                os.path.join(cohort_data_path, "cohort_with_relatives.pkl"),
                df_main.eid.values,
            )
            mask = remove_kinships(df_main.eid,
                                   kinship_table_path=kinship_table_path)
            df_main = df_main[mask]
            save_dict(
                os.path.join(cohort_data_path, "cohort_no_relatives.pkl"),
                df_main.eid.values,
            )
        else:
            print_sys("Found local copy...")

        self.cohort = load_dict(cohort_path)
        print_sys(f"There are {len(self.cohort)} samples!")
        if keep_relatives:
            no_rel = os.path.join(cohort_data_path, "cohort_no_relatives.pkl")
            if os.path.exists(no_rel):
                self.no_rel_eid = load_dict(no_rel)

    # -- covariates (reference data.py:87-155) -------------------------------

    def get_covariates(self, to_plink=False, plink_num_pca=15, return_full=False,
                       plink_filter=False):
        from sklearn.preprocessing import OneHotEncoder

        covar_path = os.path.join(self.cohort_data_path, "covariates_all.pkl")
        if os.path.exists(covar_path):
            print_sys("Found local copy...")
            self.covar = load_dict(covar_path)
        else:
            print_sys("construct co-variates from scratch...")
            df_covar = get_fields([31, 54, 21003, 22009], self.main_data_path)
            colmap = {f"22009-0.{i}": f"pca {i}" for i in range(1, 41)}
            colmap.update(
                {"31-0.0": "sex", "21003-0.0": "age", "54-0.0": "assessment_center"}
            )
            self.covar = df_covar.rename(columns=colmap)

            enc = OneHotEncoder(handle_unknown="ignore")
            enc.fit(self.covar["assessment_center"].unique().reshape(-1, 1))
            center = enc.transform(
                self.covar["assessment_center"].values.reshape(-1, 1)
            ).toarray()
            n_centers = center.shape[1]
            center_df = pd.DataFrame(center).astype("int").rename(
                columns={i: f"center_{i}" for i in range(n_centers)}
            )
            drop_cols = [
                c
                for c in ("21003-1.0", "21003-2.0", "21003-3.0",
                          "assessment_center", "54-1.0", "54-2.0", "54-3.0")
                if c in self.covar.columns
            ]
            self.covar = self.covar.drop(drop_cols, axis=1).join(center_df)

            df_fam = pd.read_csv(fam_path)
            enc = OneHotEncoder(handle_unknown="ignore")
            enc.fit(df_fam.trait.unique().reshape(-1, 1))
            batch = enc.transform(df_fam["trait"].values.reshape(-1, 1)).toarray()
            nb = batch.shape[1]
            id2batch = dict(zip(df_fam.fid.values, batch.astype(int)))
            batch_df = pd.DataFrame(
                np.stack(
                    self.covar["eid"]
                    .apply(lambda x: id2batch.get(x, np.zeros(nb, dtype=int)))
                    .values
                )
            ).rename(columns={i: f"batch_{i}" for i in range(nb)})
            self.covar = self.covar.join(batch_df)
            save_dict(covar_path, self.covar)
            print_sys("Done! Saving...")

        if not to_plink:
            if return_full:
                return self.covar.reset_index(drop=True)
            return self.covar[self.covar.eid.isin(self.cohort)].reset_index(drop=True)

        plink_path = os.path.join(
            self.cohort_data_path, f"covar_pca{plink_num_pca}_all_real_value"
        )
        if plink_filter:
            plink_path += "_null_removed"
        plink_path += ".txt"
        if not os.path.exists(plink_path):
            pca_cols = [
                c
                for c in self.covar.columns.values
                if c[:3] == "pca" and int(c.split()[-1]) <= plink_num_pca
            ]
            center = np.argmax(
                self.covar.loc[:, self.covar.columns.str.contains("center")].values,
                axis=1,
            )
            batch = np.argmax(
                self.covar.loc[:, self.covar.columns.str.contains("batch")].values,
                axis=1,
            )
            covar = self.covar.iloc[:, :43].copy()
            covar["assessment_center"] = center
            covar["batch"] = batch
            if plink_filter:
                covar = covar[covar.eid.isin(self.cohort)].reset_index(drop=True)
            covar[
                ["eid", "eid", "age", "sex", "assessment_center", "batch"] + pca_cols
            ].to_csv(plink_path, header=None, index=None, sep=" ")
            self.covar = covar
        self.covar_plink = pd.read_csv(plink_path, header=None, sep=" ")
        return self.covar_plink

    # -- phenotypes (reference data.py:157-365) -------------------------------

    def _plink_write(self, pheno, plink_path, value_col):
        if not os.path.exists(plink_path):
            pheno[["eid", "eid", value_col]].to_csv(
                plink_path, header=None, index=None, sep=" "
            )
        else:
            print_sys("Already existed! Loading...")
        return pd.read_csv(plink_path, header=None, sep=" ")

    def get_external_traits(self, trait_name, to_plink=False, to_str=True,
                            random_seed=42, sep_cohort=False, randomize=False,
                            use_sample_size=False, sample_size=-1,
                            randomize_seed=42, data_path="./data/"):
        trait_type = "binary" if trait_name in BINARY_TRAITS else "continuous"
        pheno_path = os.path.join(self.cohort_data_path, f"{trait_name}_pheno.pkl")
        if os.path.exists(pheno_path):
            print_sys("Found local copy...")
            self.pheno = load_dict(pheno_path)
        else:
            print_sys("construct phenotype from scratch...")
            self.pheno = pd.read_csv(
                os.path.join(data_path, "full_gwas", f"{trait_name}_{trait_type}.csv")
            )
            self.pheno["eid"] = self.pheno.eid.astype("int")
            self.pheno = self.pheno[self.pheno["pheno"].notnull()]
            if trait_type == "binary":
                self.pheno["pheno"] += 1
                self.pheno["pheno"] = self.pheno["pheno"].astype(int)
            save_dict(pheno_path, self.pheno)

        self.pheno = self.pheno[self.pheno.eid.isin(self.cohort)].reset_index(drop=True)
        if to_str:
            self.pheno["eid"] = self.pheno["eid"].astype("str")
        if not to_plink:
            return self.pheno

        plink_path = os.path.join(self.cohort_data_path, f"{trait_name}_plink")
        plink_path += "_with_relatives" if self.keep_relatives else "_no_relatives"
        if use_sample_size:
            plink_path += f"_{sample_size}_{random_seed}"
        if sep_cohort:
            plink_path += "_sep_cohort"
        if randomize:
            plink_path += f"_randomize{randomize_seed}"
        plink_path += ".txt"

        if randomize:
            self.pheno["pheno"] = (
                self.pheno["pheno"].sample(frac=1, random_state=randomize_seed).values
            )
        if use_sample_size:
            shuffled = self.pheno.sample(frac=1, random_state=random_seed)
            ids = shuffled.eid.values
            train_ids, test_ids = ids[:sample_size], ids[sample_size:]
            keep = test_ids if sep_cohort else train_ids
            self.pheno = self.pheno[self.pheno.eid.isin(keep)]

        self.pheno_plink = self._plink_write(
            self.pheno, plink_path, self.pheno.columns.values[-1]
        )
        return self.pheno_plink

    def get_phenotype(self, field_id, aggregate="last_value", to_plink=False,
                      to_str=True, normalize="None", frac=1, random_seed=42,
                      fastgwa_match=False, icd10=False, icd10_level=2,
                      sep_cohort=False, randomize=False, use_sample_size=False,
                      sample_size=-1, randomize_seed=42):
        pheno_path = os.path.join(self.cohort_data_path, f"{field_id}_pheno.pkl")
        if os.path.exists(pheno_path):
            print_sys("Found local copy...")
            self.pheno = load_dict(pheno_path)
        else:
            print_sys("construct phenotype from scratch...")
            if icd10:
                icd10_df = self.get_icd10(to_plink=True, level=icd10_level,
                                          get_all=True)
                self.pheno = icd10_df[["FID", field_id]].rename(
                    columns={"FID": "eid"}
                )
                self.pheno["eid"] = self.pheno.eid.astype("int")
            else:
                self.pheno = get_fields([field_id], self.main_data_path)
            save_dict(pheno_path, self.pheno)

        if len(self.pheno.columns.values) > 2 and aggregate == "last_value":
            print_sys("Getting the latest measure...")
            tmp = pd.DataFrame()
            tmp["eid"] = self.pheno.loc[:, "eid"]
            tmp[str(field_id)] = get_row_last_values(self.pheno.iloc[:, 1:])
            self.pheno = tmp[tmp[str(field_id)].notnull()]

        if fastgwa_match:
            if not self.keep_relatives:
                raise ValueError("fastgwa_match=True requires keep_relatives=True!")
            in_cohort = self.pheno[self.pheno.eid.isin(self.cohort)]
            self.rel_ratio = len(
                self.pheno[self.pheno.eid.isin(self.no_rel_eid)]
            ) / len(in_cohort)

        self.pheno = self.pheno[self.pheno.eid.isin(self.cohort)].reset_index(drop=True)

        if normalize != "None":
            y = self.pheno[str(field_id)].values
            if normalize == "log":
                y = np.log(y)
            elif normalize == "std":
                y = (y - np.mean(y)) / np.std(y)
            elif normalize == "quantile_normalization":
                from sklearn.preprocessing import quantile_transform

                y = quantile_transform(
                    y.reshape(-1, 1), output_distribution="normal", random_state=42
                ).reshape(-1)
            self.pheno[str(field_id)] = y

        if to_str:
            self.pheno["eid"] = self.pheno["eid"].astype("str")
        if not to_plink:
            return self.pheno

        plink_path = os.path.join(self.cohort_data_path, f"{field_id}_plink")
        plink_path += "_with_relatives" if self.keep_relatives else "_no_relatives"
        if normalize != "None":
            plink_path += f"_{normalize}"
        if use_sample_size:
            plink_path += f"_{sample_size}_{random_seed}"
        elif frac != 1:
            plink_path += f"_{frac}_{random_seed}"
        if fastgwa_match:
            plink_path += "_match"
        if sep_cohort:
            plink_path += "_sep_cohort"
        if randomize:
            plink_path += f"_randomize{randomize_seed}"
        plink_path += ".txt"

        if randomize:
            self.pheno[str(field_id)] = (
                self.pheno[str(field_id)]
                .sample(frac=1, random_state=randomize_seed)
                .values
            )

        if use_sample_size:
            if icd10:
                cases = self.pheno[self.pheno[str(field_id)] == 2]
                shuffled = cases.sample(frac=1, random_state=random_seed)
                keep = np.concatenate(
                    (
                        shuffled.eid.values[:sample_size],
                        self.pheno[self.pheno[str(field_id)] == 1].eid.values,
                    )
                )
                if sep_cohort:
                    raise NotImplementedError
                self.pheno = self.pheno[self.pheno.eid.isin(keep)]
            else:
                shuffled = self.pheno.sample(frac=1, random_state=random_seed)
                ids = shuffled.eid.values
                keep = ids[sample_size:] if sep_cohort else ids[:sample_size]
                self.pheno = self.pheno[self.pheno.eid.isin(keep)]
        elif frac != 1:
            from sklearn.model_selection import train_test_split

            ids, y = self.pheno.eid.values, self.pheno[str(field_id)].values
            train_ids, test_ids, y_tr, y_te = train_test_split(
                ids, y, test_size=frac, random_state=random_seed
            )
            if fastgwa_match:
                train_ids, test_ids, y_tr, y_te = train_test_split(
                    train_ids, y_tr, test_size=1 - self.rel_ratio, random_state=42
                )
            keep = test_ids if sep_cohort else train_ids
            self.pheno = self.pheno[self.pheno.eid.isin(keep)]

        self.pheno_plink = self._plink_write(
            self.pheno, plink_path, self.pheno.columns.values[-1]
        )
        return self.pheno_plink

    def get_icd10(self, to_plink=False, level=2, get_all=False):
        """ICD10 (field 41270) one-hot phenotypes, >=100-case codes only
        (reference data.py:368-426)."""
        pheno_path = os.path.join(self.cohort_data_path, "icd10.pkl")
        level_str = f"level{level}"
        if os.path.exists(pheno_path):
            print_sys("Found local copy...")
            self.icd10 = load_dict(pheno_path)
        else:
            print_sys("construct from scratch...")
            raw = get_fields([41270], self.main_data_path)
            cols = raw.columns.values[1:]
            tuples = raw.apply(
                lambda x: (x.eid, x[cols][x[cols].notnull()].values), axis=1
            )
            icd10 = pd.DataFrame(list(tuples.values)).rename(
                columns={0: "eid", 1: "level3"}
            )
            icd10["level2"] = icd10["level3"].apply(
                lambda x: np.unique([i[:3] for i in x])
            )
            save_dict(pheno_path, icd10)
            self.icd10 = icd10

        if get_all:
            self.pheno = self.icd10.reset_index(drop=True)
        else:
            self.pheno = self.icd10[self.icd10.eid.isin(self.cohort)].reset_index(
                drop=True
            )
        if not to_plink:
            return self.pheno

        suffix = (
            "with_relatives" if (self.keep_relatives or get_all) else "no_relatives"
        )
        plink_path = os.path.join(
            self.cohort_data_path, f"icd10_plink_{suffix}_{level_str}.txt"
        )
        if os.path.exists(plink_path):
            print_sys("Found local copy...")
            self.icd10_plink = pd.read_csv(plink_path, sep=" ")
        else:
            print_sys("transforming to plink files...")
            uniq = np.unique(
                [c for row in self.pheno[level_str].values for c in row]
            )
            code2idx = {c: i for i, c in enumerate(uniq)}
            onehot = np.zeros((len(self.pheno), len(uniq)), dtype=np.int8)
            for ridx, row in enumerate(self.pheno[level_str].values):
                onehot[ridx, [code2idx[c] for c in row]] = 1
            plink = pd.DataFrame(onehot).rename(
                columns={i: c for i, c in enumerate(uniq)}
            )
            counts = dict(plink.sum(axis=0))
            common = [c for c, n in counts.items() if n > 100]
            plink = plink + 1  # plink binary coding: 1=control, 2=case
            plink["IID"] = self.pheno.eid.values
            plink["FID"] = self.pheno.eid.values
            plink = plink.loc[:, ["FID", "IID"] + common]
            print_sys(f"There are {len(common)} ICD10 codes with at least 100 cases.")
            plink.to_csv(plink_path, index=None, sep=" ")
            self.icd10_plink = plink
        return self.icd10_plink
