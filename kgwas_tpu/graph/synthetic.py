"""Synthetic tiny-KG + GWAS generator for tests, benchmarks and demos.

The real KG schema (5 node types, V2G/G2G/G2P relation families, rev_* and
self-loop augmentation — reference kgwas/kgwas_data.py:112-273,
kgwas/utils.py:501-630) is reproduced in miniature with seeded numpy RNG so
every test is hermetic and deterministic. Relation names follow the
reference's naming conventions that interpretation code depends on:
``rev_`` prefixes stripped via ``x[4:]`` (utils.py:501,595) and dash-delimited
G2G/G2P names split via ``x.split('-')[1]`` (utils.py:506,612,630).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from .schema import HeteroGraph
from .transforms import standard_kg_transforms

GO_TYPES = ("CellularComponent", "BiologicalProcess", "MolecularFunction")


def _rand_edges(rng, n_src, n_dst, n_edges):
    src = rng.integers(0, n_src, size=n_edges)
    dst = rng.integers(0, n_dst, size=n_edges)
    return np.stack([src, dst]).astype(np.int64)


def make_synthetic_kg(
    n_snp: int = 200,
    n_gene: int = 60,
    n_go: int = 30,
    snp_dim: int = 20,
    gene_dim: int = 32,
    go_dim: int = 16,
    avg_degree: int = 4,
    seed: int = 0,
    apply_transforms: bool = True,
) -> HeteroGraph:
    rng = np.random.default_rng(seed)
    g = HeteroGraph()
    g.node_features["SNP"] = rng.random((n_snp, snp_dim), dtype=np.float32)
    g.node_features["Gene"] = rng.random((n_gene, gene_dim), dtype=np.float32)
    for t in GO_TYPES:
        g.node_features[t] = rng.random((n_go, go_dim), dtype=np.float32)

    g.edge_index[("SNP", "TSS", "Gene")] = _rand_edges(
        rng, n_snp, n_gene, n_snp * 1
    )
    g.edge_index[("SNP", "Enhancer-eQTL-Gene", "Gene")] = _rand_edges(
        rng, n_snp, n_gene, n_snp * avg_degree
    )
    g.edge_index[("Gene", "Gene-PPI-Gene", "Gene")] = _rand_edges(
        rng, n_gene, n_gene, n_gene * avg_degree
    )
    for t, short in (
        ("BiologicalProcess", "BiologicalProcess"),
        ("CellularComponent", "CellularComponent"),
        ("MolecularFunction", "MolecularFunction"),
    ):
        g.edge_index[("Gene", f"Gene-memberof-{short}", t)] = _rand_edges(
            rng, n_gene, n_go, n_gene * 2
        )
    g.edge_index[
        ("BiologicalProcess", "BP-parentof-BP", "BiologicalProcess")
    ] = _rand_edges(rng, n_go, n_go, n_go * 2)

    if apply_transforms:
        g = standard_kg_transforms(g)
    return g.validate()


def make_synthetic_sumstats(
    n_snp: int,
    n_causal: Optional[int] = None,
    sample_size: int = 10000,
    seed: int = 0,
    return_causal: bool = False,
):
    """fastGWA-shaped sumstats over the synthetic SNP set: columns CHR, SNP,
    POS, A1, A2, N, AF1, BETA, SE, P (reference format parsed at
    kgwas/kgwas_data.py:317-326,391-446). n_causal=0 gives a pure null
    (z ~ N(0,1) for every SNP — the reference null-simulation analog,
    reference kgwas_data.py:286-294). return_causal=True also returns the
    causal index set (for power counting in the causal arm)."""
    rng = np.random.default_rng(seed + 1)
    if n_causal is None:
        n_causal = max(n_snp // 20, 1)
    z = rng.standard_normal(n_snp)
    causal_idx = rng.choice(n_snp, size=n_causal, replace=False)
    z[causal_idx] += rng.standard_normal(n_causal) * 4.0
    se = np.full(n_snp, 0.01)
    beta = z * se
    from scipy.stats import norm

    p = 2.0 * norm.sf(np.abs(z))
    p = np.clip(p, 1e-300, 1.0)
    df = pd.DataFrame(
        {
            "CHR": rng.integers(1, 23, size=n_snp),
            "SNP": [f"rs{i}" for i in range(n_snp)],
            "POS": np.sort(rng.integers(1, 2_000_000, size=n_snp)),
            "A1": "A",
            "A2": "G",
            "N": sample_size,
            "AF1": rng.uniform(0.05, 0.5, size=n_snp),
            "BETA": beta,
            "SE": se,
            "P": p,
        }
    )
    if return_causal:
        return df, np.sort(causal_idx)
    return df


def make_synthetic_ld_scores(n_snp: int, seed: int = 0):
    """(ld_scores_df, w_ld_scores_df) shaped like
    ld_score/filter_genotyped_ldscores.csv and ldscores_from_data.csv
    (reference kgwas/kgwas_data.py:396-397): two columns, SNP id then score."""
    rng = np.random.default_rng(seed + 2)
    ids = [f"rs{i}" for i in range(n_snp)]
    ld = pd.DataFrame({"SNP": ids, "ldscore": rng.uniform(1.0, 100.0, size=n_snp)})
    w_ld = pd.DataFrame({"SNP": ids, "ldscore": rng.uniform(0.5, 60.0, size=n_snp)})
    return ld, w_ld


def make_synthetic_subsample_sumstats(
    n_snp: int,
    pheno_seed: int,
    sample_size: int,
    seed: int,
    ref_n: int = 50_000,
    n_causal: Optional[int] = None,
    return_causal: bool = False,
):
    """Subsampling power-analysis sumstats (the synthetic analog of the
    reference's cohort-subsample PLINK/fastGWA reruns, reference
    kgwas_data.py:367-389 / demo/kgwas_subsampling.ipynb).

    The TRAIT ARCHITECTURE — map positions, allele freqs, the causal SNP
    set and its true effects — is fixed by ``pheno_seed`` alone, so every
    (sample_size, seed) subsample of one trait shares CHR/POS and the same
    ground truth, and loci can be matched across runs. The marginal z of a
    causal SNP scales as sqrt(sample_size / ref_n) (chi2 noncentrality is
    linear in N); the finite-sample noise draw is governed by ``seed``.
    At sample_size == ref_n this is the full-N gold run."""
    if n_causal is None:
        n_causal = max(n_snp // 100, 1)
    rng_t = np.random.default_rng(900_000 + pheno_seed)
    chrom = rng_t.integers(1, 23, size=n_snp)
    pos = np.sort(rng_t.integers(1, 2_000_000, size=n_snp))
    af = rng_t.uniform(0.05, 0.5, size=n_snp)
    causal_idx = np.sort(rng_t.choice(n_snp, size=n_causal, replace=False))
    true_z_ref = np.zeros(n_snp)
    # effect sizes at ref_n: half discoverable (|z|~7-10), half marginal
    # (|z|~3-6) so power visibly climbs with N instead of saturating
    true_z_ref[causal_idx] = (rng_t.uniform(3.0, 10.0, size=n_causal)
                              * rng_t.choice([-1.0, 1.0], size=n_causal))

    rng_s = np.random.default_rng(
        np.random.SeedSequence([7_700_000, pheno_seed, sample_size, seed]))
    z = (true_z_ref * np.sqrt(sample_size / ref_n)
         + rng_s.standard_normal(n_snp))
    se = np.full(n_snp, 0.01)
    from scipy.stats import norm

    p = np.clip(2.0 * norm.sf(np.abs(z)), 1e-300, 1.0)
    df = pd.DataFrame(
        {
            "CHR": chrom,
            "SNP": [f"rs{i}" for i in range(n_snp)],
            "POS": pos,
            "A1": "A",
            "A2": "G",
            "N": sample_size,
            "AF1": af,
            "BETA": z * se,
            "SE": se,
            "P": p,
        }
    )
    if return_causal:
        return df, causal_idx
    return df
