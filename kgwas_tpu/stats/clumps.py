"""LD-clump benchmark machinery (host-side).

Semantics mirror reference kgwas/eval_utils.py:30-135 (clump construction
from precomputed LD dictionaries, cM-based mega-clump merging, top-K query
clumps) and :137-172 (PR curves) — the evaluation vehicle of the simulation
and subsampling analyses (demo/kgwas_simulation.ipynb cells 5-12).
"""
from __future__ import annotations

from copy import copy
from typing import List, Optional

import numpy as np
import pandas as pd

from ..utils import load_dict


def _load_ld_dict(data_path: str, no_hla: bool, snp2ld_snps: Optional[dict]):
    if snp2ld_snps:
        return snp2ld_snps
    name = "ld_score/ukb_white_ld_10MB_no_hla.pkl" if no_hla else \
        "ld_score/ukb_white_ld_10MB.pkl"
    return load_dict(data_path + name)


def build_clumps(snp_hits, snp2ld_snps) -> List[List[str]]:
    """Greedy clump construction over ranked SNP hits: each unclumped hit
    founds a clump = {hit} + its LD-tagged SNPs (reference eval_utils.py:39-56)."""
    clumps = []
    snps_in_clumps = set()
    for snp in snp_hits:
        if snp in snps_in_clumps:
            continue
        if snp in snp2ld_snps:
            clumps.append([snp] + list(snp2ld_snps[snp]))
            snps_in_clumps.update(snp2ld_snps[snp])
            snps_in_clumps.add(snp)
        else:
            clumps.append([snp])
            snps_in_clumps.add(snp)
    return clumps


def get_clumps_gold_label(
    data_path, gold_label_gwas, t_p=5e-8, no_hla=False, column="P",
    snp2ld_snps=None,
):
    """Gold clumps from significance-ranked hits (reference eval_utils.py:30-56)."""
    snp2ld_snps = _load_ld_dict(data_path, no_hla, snp2ld_snps)
    snp_hits = (
        gold_label_gwas[gold_label_gwas[column] < t_p]
        .sort_values(column)
        .SNP.values
    )
    return build_clumps(snp_hits, snp2ld_snps)


def get_meta_clumps(clumps, data_path, bim_df: Optional[pd.DataFrame] = None):
    """Merge clumps within 0.1 cM on the same chromosome into mega-clumps
    (independent loci; reference eval_utils.py:58-99)."""
    if bim_df is None:
        bim_df = pd.read_csv(
            data_path + "misc_data/ukb_white_with_cm.bim", sep="\t", header=None
        )
    snp2cm = dict(bim_df[[1, 2]].values)
    snp2chr = dict(bim_df[[1, 0]].values)

    idx2clump = {f"Clump {i}": c for i, c in enumerate(clumps)}
    idx2clump_chrom = {f"Clump {i}": snp2chr[c[0]] for i, c in enumerate(clumps)}
    idx2clump_cm = {f"Clump {i}": snp2cm[c[0]] for i, c in enumerate(clumps)}
    idx2cm_min = {
        f"Clump {i}": min(snp2cm[s] for s in c) for i, c in enumerate(clumps)
    }
    idx2cm_max = {
        f"Clump {i}": max(snp2cm[s] for s in c) for i, c in enumerate(clumps)
    }

    df_clumps = (
        pd.DataFrame(
            [idx2clump_chrom, idx2clump_cm, idx2clump, idx2cm_min, idx2cm_max]
        )
        .T.reset_index()
        .rename(
            columns={
                "index": "Clump idx",
                0: "Chromosome",
                1: "cM",
                2: "Clump rsids",
                3: "cM_min",
                4: "cM_max",
            }
        )
    )

    all_mega_clump_across_chr = []
    for chrom in df_clumps.Chromosome.unique():
        df_chr = df_clumps[df_clumps.Chromosome == chrom]
        all_mega = []
        cur = []
        base_cm = 0
        for cid, cm_hit, cm_min, cm_max in df_chr.sort_values("cM")[
            ["Clump idx", "cM", "cM_min", "cM_max"]
        ].values:
            if (cm_min - base_cm) < 0.1:
                cur.append(cid)
                base_cm = cm_max
            else:
                all_mega.append(cur)
                base_cm = cm_max
                cur = [cid]
        all_mega.append(cur)
        # the first group is empty iff the first clump started a new group
        if len(all_mega[0]) == 0:
            all_mega_clump_across_chr += all_mega[1:]
        else:
            all_mega_clump_across_chr += all_mega

    def flatten(l):
        return [item for sub in l for item in sub]

    idx2mega = {
        f"Mega-Clump {i}": c for i, c in enumerate(all_mega_clump_across_chr)
    }
    idx2mega_rsid = {
        f"Mega-Clump {i}": flatten([idx2clump[j] for j in c])
        for i, c in enumerate(all_mega_clump_across_chr)
    }
    idx2mega_chrom = {
        f"Mega-Clump {i}": idx2clump_chrom[c[0]]
        for i, c in enumerate(all_mega_clump_across_chr)
    }
    return idx2mega, idx2mega_rsid, idx2mega_chrom


def get_mega_clump_query(
    data_path, clumps, snp_hits, no_hla=False, snp2ld_snps=None,
    bim_df: Optional[pd.DataFrame] = None,
):
    """Top-K query clumps from a ranked SNP list, K = max(3*|gold|, 100)
    (reference eval_utils.py:102-135)."""
    snp2ld_snps = _load_ld_dict(data_path, no_hla, snp2ld_snps)
    clumps_pred = []
    snps_in_clumps_pred = set()
    K = max(len(clumps) * 3, 100)
    for snp in snp_hits:
        if len(clumps_pred) >= K:
            break
        if snp in snps_in_clumps_pred:
            continue
        if snp in snp2ld_snps:
            clumps_pred.append([snp] + list(snp2ld_snps[snp]))
            snps_in_clumps_pred.update(snp2ld_snps[snp])
            snps_in_clumps_pred.add(snp)
        else:
            clumps_pred.append([snp])
            snps_in_clumps_pred.add(snp)
    return get_meta_clumps(clumps_pred, data_path, bim_df=bim_df)


def get_curve(mega_clump_pred, mega_clump_gold):
    """Precision/recall@k over predicted mega-clumps vs gold
    (reference eval_utils.py:137-163)."""
    recall_k = {}
    precision_k = {}
    found_clump_idx = []
    clump_idx_record = {}
    pred_has_hit = 0
    for k, query_clump in enumerate(mega_clump_pred):
        k += 1
        overlaps_any = False
        for clump_idx, clump in enumerate(mega_clump_gold):
            if len(np.intersect1d(query_clump, clump)) > 0:
                if clump_idx not in found_clump_idx:
                    found_clump_idx.append(clump_idx)
                overlaps_any = True
        clump_idx_record[k] = copy(found_clump_idx)
        if overlaps_any:
            pred_has_hit += 1
        recall_k[k] = len(found_clump_idx) / len(mega_clump_gold)
        precision_k[k] = pred_has_hit / k
    return recall_k, precision_k, clump_idx_record


def get_prec_recall(pred_hits, gold_hits):
    recall = len(np.intersect1d(pred_hits, gold_hits)) / len(gold_hits)
    precision = (
        len(np.intersect1d(pred_hits, gold_hits)) / len(pred_hits)
        if len(pred_hits)
        else 0
    )
    return {"recall": recall, "precision": precision}
