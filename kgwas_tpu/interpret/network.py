"""Disease-critical network + per-variant interpretation.

Semantics mirror reference kgwas/utils.py:496-725 (generate_viz,
get_local_interpretation): z-score attention weights within rel_type, take
the max across parallel relations per (head, tail) pair, assemble V2G / G2G /
G2P / G2V tables, and extract per-hit-SNP top-K neighborhoods (optionally in
a process pool). The z-scoring statistics for the full tables come from the
HIT subsets — a reference quirk kept for parity (utils.py:643-651).
"""
from __future__ import annotations

import os
import pickle
from functools import partial
from multiprocessing import Pool
from typing import Optional

import numpy as np
import pandas as pd

from ..utils import load_dict, print_sys


def _zscore(df: pd.DataFrame, stats_df: pd.DataFrame) -> pd.DataFrame:
    """Attach per-rel_type z-scores computed from stats_df's mean/std."""
    rel2mean = (
        stats_df.groupby("rel_type")
        .weight.mean()
        .reset_index()
        .rename(columns={"weight": "rel_type_mean"})
    )
    rel2std = (
        stats_df.groupby("rel_type")
        .weight.agg(np.std)
        .reset_index()
        .rename(columns={"weight": "rel_type_std"})
    )
    df = df.merge(rel2std).merge(rel2mean)
    df["z_rel"] = (df["weight"] - df["rel_type_mean"]) / df["rel_type_std"]
    return df


def _max_over_parallel(df: pd.DataFrame, importance_col="z_rel") -> pd.DataFrame:
    """Per (h_idx, t_idx): keep the max-z relation (reference utils.py:592-594)."""
    best = (
        df.groupby(["h_idx", "t_idx"])[importance_col]
        .max()
        .reset_index()
        .rename(columns={importance_col: "importance"})
    )
    merged = pd.merge(
        best,
        df,
        left_on=["h_idx", "t_idx", "importance"],
        right_on=["h_idx", "t_idx", importance_col],
        how="left",
    )
    out = merged[["h_idx", "t_idx", "importance", "h_type", "t_type", "rel_type"]]
    # attention_tables emits rel_type as a pandas Categorical (fast assembly);
    # callers mutate rel_type with sliced strings (x[4:], x.split('-')[1]),
    # which a Categorical rejects — decategorize at this boundary
    if isinstance(out["rel_type"].dtype, pd.CategoricalDtype):
        out = out.assign(rel_type=out["rel_type"].astype(str))
    return out


def get_local_interpretation(query_snp, v2g, g2g, g2p, g2v, id2idx, K_neighbors):
    """Top-K neighborhood around one hit SNP (reference utils.py:496-521)."""
    try:
        snp2gene_around_snp = v2g[v2g.t_idx == id2idx["SNP"][query_snp]]
        snp2gene_around_snp = snp2gene_around_snp.sort_values("importance")[::-1]
        gene_hit = snp2gene_around_snp.iloc[:K_neighbors].copy()
        gene_hit.loc[:, "rel_type"] = gene_hit.rel_type.apply(lambda x: x[4:])

        def topk_for(table, split_rel=False):
            parts = []
            for gene in gene_hit.h_id.values:
                parts.append(
                    table[table.t_id == gene]
                    .sort_values("importance")[::-1]
                    .iloc[:K_neighbors]
                )
            out = pd.concat(parts) if parts else pd.DataFrame(columns=table.columns)
            if split_rel and len(out):
                out = out.copy()
                out.loc[:, "rel_type"] = out.rel_type.apply(
                    lambda x: x.split("-")[1]
                )
            return out

        g2g_focal = topk_for(g2g, split_rel=True)
        g2p_focal = topk_for(g2p, split_rel=True)
        g2v_focal = topk_for(g2v, split_rel=False)
        local = pd.concat((gene_hit, g2g_focal, g2p_focal, g2v_focal))
        local.loc[:, "QUERY_SNP"] = query_snp
        return local
    except Exception:
        return None


def generate_viz(
    run,
    df_network: pd.DataFrame,
    data_path: str,
    variant_threshold: float = 5e-8,
    magma_path: Optional[str] = None,
    magma_threshold: float = 0.05,
    program_threshold: float = 0.05,
    K_neighbors: int = 3,
    num_cpus: int = 1,
):
    gwas = run.kgwas_res
    idx2id = run.data.idx2id
    id2idx = run.data.id2idx
    print_sys("Start generating disease critical network...")

    go2name = {}
    go2name_path = os.path.join(data_path, "misc_data/go2name.pkl")
    if os.path.exists(go2name_path):
        with open(go2name_path, "rb") as f:
            go2name = pickle.load(f)

    # TSS edges are positional, not functional — excluded (utils.py:535)
    df_network = df_network[~df_network.rel_type.isin(["TSS", "rev_TSS"])]

    snp2genes = df_network[
        (df_network.t_type == "SNP") & (df_network.h_type == "Gene")
    ]
    gene2gene = df_network[
        (df_network.t_type == "Gene") & (df_network.h_type == "Gene")
    ]
    gene2go = df_network[
        (df_network.t_type == "Gene")
        & (df_network.h_type.isin(["BiologicalProcess"]))
    ]

    if "SNP" not in gwas.columns.values:
        gwas = gwas.copy()
        gwas.loc[:, "SNP"] = gwas["ID"]
    hit_snps = gwas[gwas.P < variant_threshold].SNP.values
    hit_snps_idx = [id2idx["SNP"][i] for i in hit_snps]

    if magma_path is not None:
        print_sys("Using MAGMA genes to filter...")
        gwas_gene = pd.read_csv(magma_path, sep=r"\s+")
        id2gene = dict(
            pd.read_csv(
                os.path.join(data_path, "misc_data/NCBI37.3.gene.loc"),
                sep="\t",
                header=None,
            )[[0, 5]].values
        )
        gwas_gene.loc[:, "GENE"] = gwas_gene["GENE"].apply(lambda x: id2gene[x])

        from ..stats.labels import bonferroni

        corrected = bonferroni(gwas_gene["P"], alpha=magma_threshold)
        gwas_gene.loc[:, "corrected_p_value"] = corrected
        df_gene_hits = gwas_gene[gwas_gene["corrected_p_value"] < magma_threshold]
        gene_hit_idx = [
            id2idx["Gene"][i] for i in df_gene_hits.GENE.values if i in id2idx["Gene"]
        ]
        go_hits_idx = _gsea_program_filter(
            df_gene_hits, data_path, id2idx, program_threshold
        )
    else:
        print_sys("No filters... Using all genes and gene programs...")
        gene_hit_idx = list(id2idx["Gene"].values())
        go_hits_idx = list(id2idx["BiologicalProcess"].values())

    # ---- disease-critical network: z-score within HIT subsets ----
    snp2genes_hit = snp2genes[
        snp2genes.t_idx.isin(hit_snps_idx) & snp2genes.h_idx.isin(gene_hit_idx)
    ]
    snp2genes_hit = _zscore(snp2genes_hit, snp2genes_hit)
    v2g_hit = _max_over_parallel(snp2genes_hit)
    v2g_hit.loc[:, "rel_type"] = v2g_hit.rel_type.apply(lambda x: x[4:])
    v2g_hit.loc[:, "Category"] = "V2G"
    v2g_hit.loc[:, "h_id"] = v2g_hit["h_idx"].apply(lambda x: idx2id["Gene"][x])
    v2g_hit.loc[:, "t_id"] = v2g_hit["t_idx"].apply(lambda x: idx2id["SNP"][x])

    gene2gene_hit = gene2gene[
        gene2gene.h_idx.isin(gene_hit_idx) & gene2gene.t_idx.isin(gene_hit_idx)
    ]
    gene2gene_hit = _zscore(gene2gene_hit, gene2gene_hit)
    g2g_hit = _max_over_parallel(gene2gene_hit)
    g2g_hit.loc[:, "rel_type"] = g2g_hit.rel_type.apply(lambda x: x.split("-")[1])
    g2g_hit.loc[:, "Category"] = "G2G"
    g2g_hit.loc[:, "h_id"] = g2g_hit["h_idx"].apply(lambda x: idx2id["Gene"][x])
    g2g_hit.loc[:, "t_id"] = g2g_hit["t_idx"].apply(lambda x: idx2id["Gene"][x])

    gene2program_hit = gene2go[
        gene2go.t_idx.isin(gene_hit_idx) & gene2go.h_idx.isin(go_hits_idx)
    ]
    gene2program_hit = _zscore(gene2program_hit, gene2program_hit)
    g2p_hit = _max_over_parallel(gene2program_hit)
    g2p_hit.loc[:, "rel_type"] = g2p_hit.rel_type.apply(lambda x: x.split("-")[1])
    g2p_hit.loc[:, "Category"] = "G2P"
    g2p_hit.loc[:, "h_id"] = g2p_hit["h_idx"].apply(
        lambda x: idx2id["BiologicalProcess"][x]
    )
    g2p_hit.loc[:, "t_id"] = g2p_hit["t_idx"].apply(lambda x: idx2id["Gene"][x])
    g2p_hit.loc[:, "h_id"] = g2p_hit.h_id.apply(
        lambda x: go2name[x].capitalize() if x in go2name else x
    )
    disease_critical_network = pd.concat((v2g_hit, g2g_hit, g2p_hit)).reset_index(
        drop=True
    )

    print_sys("Disease critical network finished generating...")
    print_sys("Generating variant interpretation networks...")

    # ---- full tables for local interpretation (stats from hit subsets,
    #      reference quirk: utils.py:643-651) ----
    v2g = _max_over_parallel(
        _zscore(snp2genes, snp2genes_hit)
    )
    v2g.loc[:, "h_id"] = v2g["h_idx"].apply(lambda x: idx2id["Gene"][x])
    v2g.loc[:, "t_id"] = v2g["t_idx"].apply(lambda x: idx2id["SNP"][x])

    g2g = _max_over_parallel(_zscore(gene2gene, gene2gene_hit))
    g2g.loc[:, "h_id"] = g2g["h_idx"].apply(lambda x: idx2id["Gene"][x])
    g2g.loc[:, "t_id"] = g2g["t_idx"].apply(lambda x: idx2id["Gene"][x])
    g2g = g2g[g2g.h_idx != g2g.t_idx]

    g2p = _max_over_parallel(_zscore(gene2go, gene2program_hit))
    g2p.loc[:, "h_id"] = g2p["h_idx"].apply(
        lambda x: go2name[idx2id["BiologicalProcess"][x]].capitalize()
        if idx2id["BiologicalProcess"][x] in go2name
        else idx2id["BiologicalProcess"][x]
    )
    g2p.loc[:, "t_id"] = g2p["t_idx"].apply(lambda x: idx2id["Gene"][x])

    gene2snp = df_network[
        (df_network.h_type == "SNP") & (df_network.t_type == "Gene")
    ]
    gene2snp_hit = gene2snp[
        gene2snp.h_idx.isin(hit_snps_idx) & gene2snp.t_idx.isin(gene_hit_idx)
    ]
    g2v = _max_over_parallel(_zscore(gene2snp, gene2snp_hit))
    g2v.loc[:, "h_id"] = g2v["h_idx"].apply(lambda x: idx2id["SNP"][x])
    g2v.loc[:, "t_id"] = g2v["t_idx"].apply(lambda x: idx2id["Gene"][x])

    print_sys(f"Number of hit snps: {len(hit_snps)}")
    process_func = partial(
        get_local_interpretation,
        v2g=v2g,
        g2g=g2g,
        g2p=g2p,
        g2v=g2v,
        id2idx=id2idx,
        K_neighbors=K_neighbors,
    )

    if num_cpus > 1:
        with Pool(num_cpus) as p:
            res = list(p.imap(process_func, hit_snps))
    else:
        res = [process_func(s) for s in hit_snps]
    kept = [i for i in res if i is not None]
    df_variant_interpretation = pd.concat(kept) if kept else pd.DataFrame()

    return df_variant_interpretation, disease_critical_network


def _gsea_program_filter(df_gene_hits, data_path, id2idx, program_threshold):
    """GSEA prerank over hit genes -> significant BP programs. The reference
    calls gseapy without importing it (latent bug, utils.py:565) — here the
    dependency is optional and failures fall back to the empty set, matching
    the reference's except-branch behavior."""
    try:
        import gseapy as gp

        gene_sets = load_dict(os.path.join(data_path, "misc_data/gene_set_bp.pkl"))
        rnk = df_gene_hits[["GENE", "ZSTAT"]].set_index("GENE")
        gsea_results_BP = gp.prerank(
            rnk=rnk,
            gene_sets=gene_sets,
            outdir=None,
            permutation_num=100,
            min_size=2,
            max_size=1000,
            seed=42,
        ).res2d
        go_hits = gsea_results_BP[
            gsea_results_BP["NOM p-val"] < program_threshold
        ].Term.values
        if len(go_hits) <= 5:
            go_hits = gsea_results_BP.sort_values("NOM p-val")[:5].Term.values
        print_sys("Using GSEA gene programs to filter...")
        return [id2idx["BiologicalProcess"][x] for x in go_hits]
    except Exception:
        print_sys("No significant gene programs found...")
        return []
