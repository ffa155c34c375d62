"""KGWAS_Data: KG + GWAS sumstats data layer (host-side).

API mirror of reference kgwas/kgwas_data.py:19-559 over the TPU-native graph
stack: pickles/CSVs are ingested into a HeteroGraph, put through the
reference's exact transform pipeline (ToUndirected + AddSelfLoops semantics),
and compiled once into static-shape device shards (graph/shard_compile.py)
instead of being neighbor-sampled per batch.

All GWAS-side processing (LDSC weights, chi-square labels, splits) is
host-side numpy/pandas with algorithms numerically identical to the
reference — final KGWAS_P parity depends on them.
"""
from __future__ import annotations

import os
import pickle
import tarfile
import urllib.request
from typing import Optional

import numpy as np
import pandas as pd

from .graph.schema import HeteroGraph
from .graph.shard_compile import CompiledGraph, compile_graph
from .graph.synthetic import (
    make_synthetic_kg,
    make_synthetic_ld_scores,
    make_synthetic_subsample_sumstats,
    make_synthetic_sumstats,
)
from .graph.transforms import standard_kg_transforms
from .stats.ldsc import ldsc_regression_weights
from .utils import load_dict, print_sys

GO_TYPES = ("CellularComponent", "BiologicalProcess", "MolecularFunction")

# embedding option -> (pickle path relative to data_path, fallback dim)
# dims mirror reference kgwas_data.py:133-252
SNP_EMB_SPECS = {
    "random": (None, 128),
    "kg": ("cell_kg/node_emb/transe_emb/transe_emb_inverse_triplets.pkl", 50),
    "cadd": ("cell_kg/node_emb/variant_emb/cadd_feat.csv", 64),
    "baselineLD": ("cell_kg/node_emb/variant_emb/baselineld_feat.pkl", 70),
    "SLDSC": ("cell_kg/node_emb/variant_emb/sldsc_feat.pkl", 165),
    "enformer": ("cell_kg/node_emb/variant_emb/enformer_feat.pkl", 20),
}
GO_EMB_SPECS = {
    "random": (None, 128),
    "kg": ("cell_kg/node_emb/transe_emb/transe_emb_inverse_triplets.pkl", 50),
    "biogpt": ("cell_kg/node_emb/program_emb/biogpt_feat.pkl", 1600),
}
GENE_EMB_SPECS = {
    "random": (None, 128),
    "kg": ("cell_kg/node_emb/transe_emb/transe_emb_inverse_triplets.pkl", 50),
    "esm": ("cell_kg/node_emb/gene_emb/esm_feat.pkl", 5120),
    "pops": ("cell_kg/node_emb/gene_emb/pops_feat.pkl", 57742),
    "pops_expression": ("cell_kg/node_emb/gene_emb/pops_expression_feat.pkl", 40546),
}

BINARY_TRAITS = [
    "body_BALDING1",
    "cancer_BREAST",
    "disease_ALLERGY_ECZEMA_DIAGNOSED",
    "disease_HYPOTHYROIDISM_SELF_REP",
    "other_MORNINGPERSON",
    "pigment_SUNBURN",
]

CORE_DATA_URL = "https://dataverse.harvard.edu/api/access/datafile/10731230"
EXAMPLE_GWAS_URL = "https://dataverse.harvard.edu/api/access/datafile/10730346"

REQUIRED_FILES = [
    "cell_kg/network/node_idx2id.pkl",
    "cell_kg/network/edge_index.pkl",
    "cell_kg/network/node_id2idx.pkl",
    "cell_kg/node_emb/variant_emb/enformer_feat.pkl",
    "cell_kg/node_emb/gene_emb/esm_feat.pkl",
    "ld_score/filter_genotyped_ldscores.csv",
    "ld_score/ldscores_from_data.csv",
    "ld_score/ukb_white_ld_10MB_no_hla.pkl",
    "ld_score/ukb_white_ld_10MB.pkl",
    "misc_data/ukb_white_with_cm.bim",
]


class KGWAS_Data:
    def __init__(self, data_path: str = "./data/", offline: bool = False):
        self.data_path = data_path
        os.makedirs(data_path, exist_ok=True)
        self.graph: Optional[HeteroGraph] = None
        self.compiled: Optional[CompiledGraph] = None
        self._synthetic = False

        missing = [
            f for f in REQUIRED_FILES if not os.path.exists(os.path.join(data_path, f))
        ]
        if missing and not offline:
            print_sys(
                "Relevant data not found in the data_path. "
                "Downloading and extracting data..."
            )
            self._download_and_extract_data(CORE_DATA_URL, "kgwas_core_data")
        elif not missing:
            print_sys("All required data files are present.")

    def download_all_data(self):
        """Download the full ~55GB bundle (reference kgwas_data.py:50-53;
        upstream URL placeholder mirrors the reference)."""
        url = "https://dataverse.harvard.edu/api/access/datafile/XXXX"
        self._download_and_extract_data(url, "kgwas_data")

    # -- download helpers (reference kgwas_data.py:67-109) ------------------

    def _download_with_progress(self, url, file_path):
        request = urllib.request.Request(url, headers={"User-Agent": "Mozilla/5.0"})
        response = urllib.request.urlopen(request)
        # response.headers works for both http(s) and file:// handlers
        # (file:// responses don't implement getheader)
        total = int(str(response.headers.get("Content-Length", "0")).strip() or 0)
        block = 1024 * 64
        done = 0
        with open(file_path, "wb") as f:
            while True:
                buf = response.read(block)
                if not buf:
                    break
                f.write(buf)
                done += len(buf)
                if total:
                    print_sys(f"download {done/total:.1%}")

    def _download_and_extract_data(self, url, file_name):
        tar_path = os.path.join(self.data_path, f"{file_name}.tar.gz")
        self._download_with_progress(url, tar_path)
        with tarfile.open(tar_path, "r:gz") as tar:
            # 'data' filter: reject absolute paths/links escaping data_path
            tar.extractall(self.data_path, filter="data")
        os.remove(tar_path)
        extracted = os.path.join(self.data_path, file_name)
        if os.path.exists(extracted):
            import shutil

            for root, _, files in os.walk(extracted):
                rel = os.path.relpath(root, extracted)
                dst_dir = os.path.join(self.data_path, rel)
                os.makedirs(dst_dir, exist_ok=True)
                for fn in files:
                    dst = os.path.join(dst_dir, fn)
                    if not os.path.exists(dst):
                        shutil.move(os.path.join(root, fn), dst)
            shutil.rmtree(extracted)

    # -- KG loading (reference kgwas_data.py:112-273) -----------------------

    def _build_features(self, node_map, feat_lookup, dim, rng):
        """Per-node embedding rows with torch.rand-style random fallback for
        nodes missing from the table (reference kgwas_data.py:144-251)."""
        rows = np.empty((len(node_map), dim), dtype=np.float32)
        n_missing = 0
        for i in range(len(node_map)):
            node_id = node_map[i]
            vec = feat_lookup(node_id)
            if vec is None:
                rows[i] = rng.random(dim, dtype=np.float32)
                n_missing += 1
            else:
                rows[i] = np.asarray(vec, dtype=np.float32)
        if n_missing:
            print_sys(f"  {n_missing}/{len(node_map)} nodes got random fallback rows")
        return rows

    def load_kg(
        self,
        snp_init_emb: str = "enformer",
        go_init_emb: str = "random",
        gene_init_emb: str = "esm",
        sample_edges: bool = False,
        sample_ratio: float = 1.0,
        rng_seed: int = 42,
    ):
        data_path = self.data_path
        print_sys("--loading KG---")
        idx2id = load_dict(os.path.join(data_path, "cell_kg/network/node_idx2id.pkl"))
        edge_index_all = load_dict(
            os.path.join(data_path, "cell_kg/network/edge_index.pkl")
        )
        id2idx = load_dict(os.path.join(data_path, "cell_kg/network/node_id2idx.pkl"))
        self.id2idx = id2idx
        self.idx2id = idx2id

        rng = np.random.default_rng(rng_seed)
        g = HeteroGraph()

        # SNP features
        path, dim = SNP_EMB_SPECS[snp_init_emb]
        if snp_init_emb == "random":
            g.node_features["SNP"] = rng.random(
                (len(idx2id["SNP"]), dim), dtype=np.float32
            )
        elif snp_init_emb == "cadd":
            df = pd.read_csv(os.path.join(data_path, path)).set_index("Unnamed: 0")
            table = {k: v for k, v in zip(df.index.values, df.values)}
            g.node_features["SNP"] = self._build_features(
                idx2id["SNP"], lambda nid: table.get(nid), dim, rng
            )
        elif snp_init_emb == "kg":
            id2idx_kg = load_dict(
                os.path.join(
                    data_path, "cell_kg/node_emb/transe_emb/transe_emb_id2idx_kg.pkl"
                )
            )
            kg_emb = load_dict(os.path.join(data_path, path))
            g.node_features["SNP"] = self._build_features(
                idx2id["SNP"],
                lambda nid: kg_emb[id2idx_kg[nid]] if nid in id2idx_kg else None,
                dim,
                rng,
            )
        else:
            table = load_dict(os.path.join(data_path, path))
            g.node_features["SNP"] = self._build_features(
                idx2id["SNP"], lambda nid: table.get(nid), dim, rng
            )
        snp_init_dim_size = dim

        # GO features (shared spec across 3 GO types — reference :186-212)
        path, dim = GO_EMB_SPECS[go_init_emb]
        if go_init_emb == "random":
            for t in GO_TYPES:
                g.node_features[t] = rng.random(
                    (len(idx2id[t]), dim), dtype=np.float32
                )
        elif go_init_emb == "kg":
            id2idx_kg = load_dict(
                os.path.join(
                    data_path, "cell_kg/node_emb/transe_emb/transe_emb_id2idx_kg.pkl"
                )
            )
            kg_emb = load_dict(os.path.join(data_path, path))
            for t in GO_TYPES:
                g.node_features[t] = self._build_features(
                    idx2id[t],
                    lambda nid: kg_emb[id2idx_kg[nid]] if nid in id2idx_kg else None,
                    dim,
                    rng,
                )
        else:
            table = load_dict(os.path.join(data_path, path))
            for t in GO_TYPES:
                g.node_features[t] = self._build_features(
                    idx2id[t], lambda nid: table.get(nid), dim, rng
                )
        go_init_dim_size = dim

        # Gene features
        path, dim = GENE_EMB_SPECS[gene_init_emb]
        if gene_init_emb == "random":
            g.node_features["Gene"] = rng.random(
                (len(idx2id["Gene"]), dim), dtype=np.float32
            )
        elif gene_init_emb == "kg":
            id2idx_kg = load_dict(
                os.path.join(
                    data_path, "cell_kg/node_emb/transe_emb/transe_emb_id2idx_kg.pkl"
                )
            )
            kg_emb = load_dict(os.path.join(data_path, path))
            g.node_features["Gene"] = self._build_features(
                idx2id["Gene"],
                lambda nid: kg_emb[id2idx_kg[nid]] if nid in id2idx_kg else None,
                dim,
                rng,
            )
        else:
            table = load_dict(os.path.join(data_path, path))
            g.node_features["Gene"] = self._build_features(
                idx2id["Gene"], lambda nid: table.get(nid), dim, rng
            )
        gene_init_dim_size = dim

        self.gene_init_dim_size = gene_init_dim_size
        self.go_init_dim_size = go_init_dim_size
        self.snp_init_dim_size = snp_init_dim_size

        # edges (+ optional subsampling, reference :259-268)
        for et, ei in edge_index_all.items():
            ei = np.asarray(ei, dtype=np.int64)
            if sample_edges:
                e = ei.shape[1]
                k = int(e * sample_ratio)
                idx = rng.permutation(e)[:k]
                print_sys(
                    f"{et} sampling ratio {sample_ratio} from {e} to {k}"
                )
                ei = ei[:, idx]
            g.edge_index[tuple(et)] = ei

        g = standard_kg_transforms(g)
        self.graph = g.validate()
        self.compiled = None
        return self

    # -- synthetic mode (tests / demo / bench; no reference analog) ---------

    @classmethod
    def from_synthetic(
        cls,
        n_snp: int = 500,
        n_gene: int = 100,
        n_go: int = 40,
        seed: int = 42,
        data_path: str = "./data_synth/",
        **kg_kwargs,
    ) -> "KGWAS_Data":
        self = cls(data_path=data_path, offline=True)
        self._synthetic = True
        g = make_synthetic_kg(n_snp=n_snp, n_gene=n_gene, n_go=n_go, seed=seed,
                              **kg_kwargs)
        self.graph = g
        self.snp_init_dim_size = g.feature_dim("SNP")
        self.gene_init_dim_size = g.feature_dim("Gene")
        self.go_init_dim_size = g.feature_dim("BiologicalProcess")
        snp_ids = [f"rs{i}" for i in range(n_snp)]
        gene_ids = [f"G{i}" for i in range(n_gene)]
        go_ids = [f"GO{i}" for i in range(n_go)]
        self.idx2id = {
            "SNP": dict(enumerate(snp_ids)),
            "Gene": dict(enumerate(gene_ids)),
            **{t: dict(enumerate(go_ids)) for t in GO_TYPES},
        }
        self.id2idx = {
            t: {v: k for k, v in m.items()} for t, m in self.idx2id.items()
        }
        self._synth_sumstats = make_synthetic_sumstats(n_snp, seed=seed)
        self._synth_ld, self._synth_w_ld = make_synthetic_ld_scores(n_snp, seed=seed)
        return self

    def load_synthetic_gwas(self, seed: int = 42):
        assert self._synthetic, "only valid for from_synthetic data"
        self.lr_uni = self._synth_sumstats.rename(
            columns={"CHR": "#CHROM", "SNP": "ID"}
        )
        self.sample_size = int(self.lr_uni.N.values[0])
        self.pheno = "SYNTHETIC"
        self.seed = seed
        return self

    # -- GWAS sumstats loaders (reference kgwas_data.py:275-389) ------------

    def load_external_gwas(self, path=None, seed=42, example_file=False):
        if example_file:
            example_path = os.path.join(
                self.data_path, "biochemistry_Creatinine_fastgwa_full_10000_1.fastGWA"
            )
            if not os.path.exists(example_path):
                print_sys("Example file not found locally. Downloading...")
                self._download_with_progress(EXAMPLE_GWAS_URL, example_path)
            path = example_path
        if path is None:
            raise ValueError(
                "A valid path must be provided or example_file must be set to True."
            )
        print_sys(f"Loading GWAS file from {path}...")
        lr_uni = pd.read_csv(path, sep=None, engine="python")
        for col in ("CHR", "SNP", "P", "N"):
            if col not in lr_uni.columns.values:
                raise ValueError(f"{col} column not in the file!")
        lr_uni = lr_uni.rename(columns={"CHR": "#CHROM", "SNP": "ID"})

        old_len = len(lr_uni)
        kg_snps = set(self.idx2id["SNP"].values())
        lr_uni = lr_uni[lr_uni.ID.isin(kg_snps)]
        print_sys(f"Number of SNPs in the KG: {len(self.idx2id['SNP'])}")
        print_sys(f"Number of SNPs in the GWAS: {old_len}")
        print_sys(f"Number of SNPs in the KG variant set: {len(lr_uni)}")

        self.lr_uni = lr_uni
        self.sample_size = lr_uni.N.values[0]
        self.pheno = "EXTERNAL"
        self.seed = seed

    def load_simulation_gwas(self, simulation_type, seed):
        """Simulation sumstats file naming mirrors reference :275-294."""
        data_path = self.data_path
        print_sys("Using simulation data....")
        small_cohort = 5000
        num_causal_hits = 20000
        heritability = 0.3
        self.sample_size = small_cohort
        if simulation_type == "causal_link":
            fp = os.path.join(
                data_path,
                "simulation_gwas/causal_link_simulation/"
                f"{num_causal_hits}_{seed}_{heritability}_graph_funct_v2_ggi.fastGWA",
            )
        elif simulation_type == "causal":
            fp = os.path.join(
                data_path,
                "simulation_gwas/causal_simulation/"
                f"{num_causal_hits}_{seed}_{heritability}_{small_cohort}"
                "_graph_funct_v2.fastGWA",
            )
        elif simulation_type == "null":
            fp = os.path.join(
                data_path,
                "simulation_gwas/null_simulation/"
                f"{num_causal_hits}_{seed}_{heritability}_{small_cohort}.fastGWA",
            )
        else:
            raise ValueError(f"unknown simulation_type {simulation_type!r}")
        lr_uni = pd.read_csv(fp, sep="\t")
        if ("SNP" in lr_uni.columns.values) and ("ID" in lr_uni.columns.values):
            self.lr_uni = lr_uni.rename(columns={"CHR": "#CHROM"})
        else:
            self.lr_uni = lr_uni.rename(columns={"CHR": "#CHROM", "SNP": "ID"})
        self.seed = seed
        self.pheno = "simulation"

    def load_full_gwas(self, pheno, seed=42):
        data_path = self.data_path
        from .params import scdrs_traits

        if pheno in scdrs_traits:
            print_sys("Using scdrs traits...")
            self.pheno = pheno
            lr_uni = pd.read_csv(
                os.path.join(data_path, "scDRS_Data/sumstats_ukb_snps.csv")
            )
            lr_uni = lr_uni[["CHR", "SNP", "POS", "A1", "A2", "N", "AF1", pheno]]
            lr_uni = lr_uni[lr_uni[pheno].notnull()].reset_index(drop=True)
            lr_uni = lr_uni.rename(
                columns={"CHR": "#CHROM", "SNP": "ID", pheno: "chi"}
            )
            self.lr_uni = lr_uni
            self.seed = seed
            with open(os.path.join(data_path, "scDRS_data/trait2size.pkl"), "rb") as f:
                trait2size = pickle.load(f)
            self.sample_size = trait2size[pheno]
        else:
            self.pheno = pheno
            lr_uni = pd.read_csv(
                os.path.join(data_path, f"full_gwas/{pheno}_with_rel_fastgwa.fastGWA"),
                sep="\t",
            )
            self.lr_uni = lr_uni.rename(columns={"CHR": "#CHROM", "SNP": "ID"})
            self.seed = seed
            self.sample_size = 387113

    def load_gwas_subsample(self, pheno, sample_size, seed):
        data_path = self.data_path
        binary = pheno in BINARY_TRAITS
        self.sample_size = sample_size
        self.pheno = pheno
        if sample_size > 3000:
            fp = os.path.join(
                data_path,
                f"subsample_gwas/{pheno}_fastgwa_full_{sample_size}_{seed}.fastGWA",
            )
            lr_uni = pd.read_csv(fp, sep="\t")
            lr_uni = lr_uni.rename(columns={"CHR": "#CHROM", "SNP": "ID"})
        else:
            suffix = (
                "PHENO1.glm.logistic.hybrid" if binary else "PHENO1.glm.linear"
            )
            fp = os.path.join(
                data_path,
                f"subsample_gwas/{pheno}_plink_{sample_size}_{seed}.{suffix}",
            )
            lr_uni = pd.read_csv(fp, sep="\t")
        self.lr_uni = lr_uni
        self.seed = seed

    def load_synthetic_gwas_subsample(self, pheno_seed, sample_size, seed,
                                      ref_n=50_000):
        """Synthetic analog of load_gwas_subsample (reference
        kgwas_data.py:367-389): trait architecture fixed by pheno_seed,
        marginal power scaling with sample_size, fresh subsample noise per
        seed — drives the full subsampling power-analysis workflow
        (scripts/run_sweep.py --synthetic-n-snp) without the UKBB cohort."""
        assert self._synthetic, "only valid for from_synthetic data"
        df, causal = make_synthetic_subsample_sumstats(
            len(self.idx2id["SNP"]), pheno_seed=pheno_seed,
            sample_size=sample_size, seed=seed, ref_n=ref_n,
            return_causal=True)
        self.lr_uni = df.rename(columns={"CHR": "#CHROM", "SNP": "ID"})
        self.sample_size = sample_size
        self.pheno = f"synthetic_{pheno_seed}"
        self.seed = seed
        self._synth_causal_idx = causal
        return self

    # -- processing + splits (reference kgwas_data.py:391-545) --------------

    def process_gwas_file(self, label: str = "chi"):
        data_path = self.data_path
        lr_uni = self.lr_uni

        if self._synthetic:
            ld_scores, w_ld_scores = self._synth_ld, self._synth_w_ld
        else:
            ld_scores = pd.read_csv(
                os.path.join(data_path, "ld_score/filter_genotyped_ldscores.csv")
            )
            w_ld_scores = pd.read_csv(
                os.path.join(data_path, "ld_score/ldscores_from_data.csv")
            )

        m = 15000000
        if "N" not in lr_uni.columns.values:
            n = self.sample_size
        else:
            n = np.mean(lr_uni.N)
        h_g_2 = 0.5
        rs_id_2_ld_scores = dict(ld_scores.values)
        rs_id_2_w_ld = dict(w_ld_scores.values)

        min_ld = min(rs_id_2_ld_scores.values())
        lr_uni["ld_score"] = lr_uni.ID.apply(
            lambda x: rs_id_2_ld_scores[x] if x in rs_id_2_ld_scores else min_ld
        )
        rs_id_2_ld_scores = dict(lr_uni[["ID", "ld_score"]].values)

        min_ld = min(rs_id_2_w_ld.values())
        # data LD excludes the query SNP itself, so add 1 (reference :416-417)
        lr_uni["w_ld_score"] = 1 + lr_uni.ID.apply(
            lambda x: rs_id_2_w_ld[x] if x in rs_id_2_w_ld else min_ld
        )
        rs_id_2_w_ld = dict(lr_uni[["ID", "w_ld_score"]].values)

        print_sys("Using ldsc weight...")
        ld = np.array([rs_id_2_ld_scores[r] for r in lr_uni.ID.values])
        w_ld = np.array([rs_id_2_w_ld[r] for r in lr_uni.ID.values])

        ldsc_weight = ldsc_regression_weights(ld, w_ld, n, m, h_g_2)
        ldsc_weight = ldsc_weight / np.mean(ldsc_weight)
        self.rs_id_to_ldsc_weight = dict(zip(lr_uni.ID.values, ldsc_weight))

        if label == "chi":
            if "chi" in lr_uni.columns.values:
                print_sys("chi pre-computed...")
                lr_uni["y"] = lr_uni["chi"].values
            elif (
                self.pheno in BINARY_TRAITS and self.sample_size <= 3000
            ):
                lr_uni["y"] = lr_uni["Z_STAT"].values ** 2
                lr_uni["y"] = lr_uni.y.fillna(0)
            elif ("BETA" in lr_uni.columns.values) and (
                "SE" in lr_uni.columns.values
            ):
                lr_uni["y"] = (lr_uni["BETA"] / lr_uni["SE"]).values ** 2
                lr_uni["y"] = lr_uni.y.fillna(0)
            else:
                from scipy.stats import chi2

                lr_uni["y"] = chi2.ppf(1 - lr_uni["P"].values, 1)
                lr_uni["y"] = lr_uni.y.fillna(0)
        elif label in (
            "residual-w-ld",
            "residual-ld",
            "residual-ld-ols",
            "residual-ld-ols-abs",
            "residual-w-ld-ols",
        ):
            from .stats.labels import residual_label

            lr_uni["ld_weight"] = lr_uni.ID.apply(
                lambda x: self.rs_id_to_ldsc_weight[x]
            )
            lr_uni["y"] = residual_label(lr_uni, label)
        else:
            raise ValueError(f"unknown label mode {label!r}")

        all_ids = lr_uni.ID.values
        self.all_ids = np.array([self.id2idx["SNP"][i] for i in all_ids])
        self.y = lr_uni.y.values
        self.lr_uni = lr_uni

    def prepare_split(self, test_set_fraction_data: float = 0.05):
        """sklearn double-split with the run seed — identical to reference
        :522-545 so train/val/test membership matches exactly."""
        from sklearn.model_selection import train_test_split

        train_val_ids, test_ids, y_train_val, y_test = train_test_split(
            self.all_ids,
            self.y,
            test_size=test_set_fraction_data,
            random_state=self.seed,
        )
        train_ids, val_ids, y_train, y_val = train_test_split(
            train_val_ids, y_train_val, test_size=0.05, random_state=self.seed
        )

        self.train_input_nodes = ("SNP", train_ids)
        self.val_input_nodes = ("SNP", val_ids)
        self.test_input_nodes = ("SNP", test_ids)

        n_snp = self.graph.num_nodes("SNP")
        y_snp = np.zeros(n_snp, dtype=np.float32) - 1
        y_snp[train_ids] = y_train
        y_snp[val_ids] = y_val
        y_snp[test_ids] = y_test
        self.graph.node_labels["SNP"] = y_snp

        self.train_mask = train_ids
        self.val_mask = val_ids
        self.test_mask = test_ids
        self.all_mask = self.all_ids

    # -- shard compilation (new: TPU path) ----------------------------------

    def compile(self, edge_pad_multiple: int = 512,
                node_pad_multiple: Optional[int] = None, force: bool = False):
        """node_pad_multiple defaults to the Pallas kernel tile BN (512; the
        benched config) so node row spaces are kernel-tile aligned — the
        fused TPU path requires every per-relation row/src block to be a BN
        multiple."""
        if node_pad_multiple is None:
            from .ops.pallas_segment import BN

            node_pad_multiple = max(256, BN)
        if self.compiled is None or force:
            self.compiled = compile_graph(
                self.graph,
                edge_pad_multiple=edge_pad_multiple,
                node_pad_multiple=node_pad_multiple,
            )
        return self.compiled

    def get_pheno_list(self):
        from .params import scdrs_traits, indep_traits_21

        return {"large_cohort": scdrs_traits, "21_indep_traits": indep_traits_21}
