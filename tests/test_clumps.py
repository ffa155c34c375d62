"""Clump/mega-clump machinery + GWAS eval tests on fabricated LD structure,
including parity vs the reference implementation loaded as a sealed oracle."""
import types

import numpy as np
import pandas as pd
import pytest

from kgwas_tpu.stats.clumps import (
    build_clumps,
    get_clumps_gold_label,
    get_curve,
    get_meta_clumps,
    get_prec_recall,
)
from kgwas_tpu.stats.gwas_eval import (
    find_overlap_clusters,
    get_cluster_from_gwas,
    get_gwas_results,
)

REF = "/root/reference/kgwas"


@pytest.fixture(scope="module")
def ref_eval_utils():
    src = open(f"{REF}/eval_utils.py").read()
    src = src.replace("from .utils import load_dict", "")
    src = src.replace("import torch", "")
    mod = types.ModuleType("ref_eval_utils2")
    mod.load_dict = lambda p: None
    exec(compile(src, "ref_eval_utils2", "exec"), mod.__dict__)
    return mod


def _ld_world(seed=0, n_snp=200):
    """SNPs rs0..rsN on 3 chromosomes with synthetic LD blocks + cM map."""
    rng = np.random.default_rng(seed)
    ids = [f"rs{i}" for i in range(n_snp)]
    chrom = rng.integers(1, 4, n_snp)
    cm = np.round(rng.uniform(0, 50, n_snp), 3)
    bim = pd.DataFrame({0: chrom, 1: ids, 2: cm, 3: 0, 4: "A", 5: "G"})
    snp2ld = {}
    for i in range(0, n_snp, 10):  # every 10th snp tags the next 3
        snp2ld[ids[i]] = [ids[j] for j in range(i + 1, min(i + 4, n_snp))]
    return ids, bim, snp2ld, rng


def test_build_clumps_no_double_assignment():
    ids, bim, snp2ld, rng = _ld_world()
    hits = ids[:30]
    clumps = build_clumps(hits, snp2ld)
    seen = [s for c in clumps for s in c]
    # a SNP already swallowed by an earlier clump never founds another
    founders = [c[0] for c in clumps]
    for f in founders:
        owners = [c for c in clumps if f in c]
        assert len(owners) >= 1
    # every hit is covered
    assert set(hits) <= set(seen)


def test_get_curve_parity_with_reference(ref_eval_utils):
    rng = np.random.default_rng(1)
    gold = [[f"g{i}_{j}" for j in range(3)] for i in range(6)]
    pred = [
        gold[0][:1],
        ["miss_a"],
        gold[2][:2],
        ["miss_b"],
        gold[2][1:],  # overlaps an already-found clump
        gold[5],
    ]
    r_ours, p_ours, rec_ours = get_curve(pred, gold)
    r_ref, p_ref, rec_ref = ref_eval_utils.get_curve(pred, gold)
    assert r_ours == r_ref
    assert p_ours == p_ref
    assert rec_ours == rec_ref


def test_meta_clumps_merge_within_cm(tmp_path):
    ids, bim, snp2ld, rng = _ld_world()
    # clumps on chr1 at cM 1.0, 1.05 (merge), 5.0 (separate)
    bim = bim.copy()
    bim.loc[bim[1] == "rs0", [0, 2]] = [1, 1.0]
    bim.loc[bim[1] == "rs10", [0, 2]] = [1, 1.05]
    bim.loc[bim[1] == "rs20", [0, 2]] = [1, 5.0]
    clumps = [["rs0"], ["rs10"], ["rs20"]]
    idx2mega, idx2rsid, idx2chrom = get_meta_clumps(clumps, "", bim_df=bim)
    sizes = sorted(len(v) for v in idx2mega.values())
    assert sizes == [1, 2]


def test_gold_label_clumps_threshold(tmp_path):
    ids, bim, snp2ld, rng = _ld_world()
    gwas = pd.DataFrame(
        {"SNP": ids, "P": rng.uniform(0, 1, len(ids))}
    )
    gwas.loc[:20, "P"] = 1e-10
    clumps = get_clumps_gold_label(
        str(tmp_path) + "/", gwas, t_p=5e-8, snp2ld_snps=snp2ld
    )
    hit_set = set(gwas[gwas.P < 5e-8].SNP)
    covered = set(s for c in clumps for s in c)
    assert hit_set <= covered


def test_prec_recall():
    out = get_prec_recall(np.array(["a", "b", "c"]), np.array(["b", "c", "d"]))
    assert out["recall"] == pytest.approx(2 / 3)
    assert out["precision"] == pytest.approx(2 / 3)
    out0 = get_prec_recall(np.array([]), np.array(["x"]))
    assert out0["precision"] == 0


def test_cluster_from_gwas_positions():
    df = pd.DataFrame(
        {
            "#CHROM": [1, 1, 1, 1, 2],
            "POS": [100, 200, 900000, 950000, 500],
            "ID": ["a", "b", "c", "d", "e"],
        }
    )
    pos, rs, *_, rng_out = get_cluster_from_gwas(
        df, cluster_distance_threshold=500000,
        cluster_compare_threshold=1000, verbose=False,
    )
    assert len(pos[1]) == 2  # {100,200} and {900000,950000}
    assert len(pos[2]) == 1
    overlaps = find_overlap_clusters(rng_out, rng_out)
    assert all(len(v) == len(rng_out[k]) for k, v in overlaps.items())


def test_get_gwas_results_metrics():
    rng = np.random.default_rng(3)
    n = 2000
    ids = [f"rs{i}" for i in range(n)]
    p = rng.uniform(0, 1, n)
    hits_all = np.array(ids[:50])
    p[:50] = rng.uniform(0, 1e-9, 50)  # true hits rank first
    res = pd.DataFrame({"ID": ids, "P": p})
    out = get_gwas_results(res, hits_all, n)
    assert out["overall_recall"] == 1.0
    assert out["precision_100"] == pytest.approx(0.5)
    assert out["PR@80_K"] <= 100


def test_quantile_normalize_matches_reference(ref_eval_utils):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"a": rng.random(50), "b": rng.random(50) * 10})
    from kgwas_tpu.stats.gwas_eval import quantile_normalize

    ours = quantile_normalize(df)
    ref = ref_eval_utils.quantileNormalize(df)
    pd.testing.assert_frame_equal(ours, ref)


def test_get_cluster_count_and_topk():
    rng = np.random.default_rng(4)
    n = 300
    gold = pd.DataFrame(
        {
            "#CHROM": rng.integers(1, 4, n),
            "POS": rng.integers(1, 10_000_000, n),
            "ID": [f"rs{i}" for i in range(n)],
        }
    )
    from kgwas_tpu.stats.gwas_eval import get_cluster_count, get_cluster_from_gwas

    (_, _, _, _, _, gold_rng) = get_cluster_from_gwas(
        gold, 500000, cluster_compare_threshold=250000, verbose=False
    )
    out = get_cluster_count(gold, 500000, 250000, False, gold_rng)
    # self-comparison: same clustering on both sides; overlap counts can fall
    # below total because extended ranges make adjacent clusters overlap and
    # the reference's matcher breaks at the FIRST overlapping gold cluster
    # (reference eval_utils.py:400-405)
    assert out["set_total"] == out["total_set"]
    assert 0 < out["set_overlap_ref"] <= out["total_set"]
    assert 0 < out["set_overlap_query"] <= out["set_total"]
