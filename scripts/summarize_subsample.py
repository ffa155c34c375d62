"""Summarize a run_sweep.py --synthetic-n-snp subsample sweep into the
power-analysis table (benchmarks/SUBSAMPLE.md).

Per trait (pheno seed): the gold run is the job at sample_size == --ref-n.
For every (sample_size, seed) job we report GWAS/KGWAS hits and loci, causal
recovery, and LOCI REPLICATION vs the gold run's GWAS loci — a subsample
locus (chrom, lead cM) replicates if the gold run has a locus on the same
chromosome within 0.1 cM (the mega-clump merge radius, reference
eval_utils.py:58-99).

Run: python scripts/summarize_subsample.py --out-dir sweep_results/ \
        --ref-n 50000 > benchmarks/SUBSAMPLE.md
"""
import argparse
import glob
import json
import os
from collections import defaultdict


def replicated(loci, gold_loci, radius=0.1):
    hits = 0
    for chrom, cm in loci:
        if any(gc == chrom and abs(gcm - cm) < radius
               for gc, gcm in gold_loci):
            hits += 1
    return hits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="./sweep_results/")
    ap.add_argument("--ref-n", type=int, default=50_000)
    args = ap.parse_args()

    jobs = []
    for fp in sorted(glob.glob(os.path.join(args.out_dir, "*.json"))):
        with open(fp) as f:
            jobs.append(json.load(f))
    by_trait = defaultdict(list)
    for j in jobs:
        if j["job"][0] != "subsample":
            continue
        _, pheno, n, seed = j["job"]
        by_trait[str(pheno)].append((int(n), int(seed), j))

    print("# Synthetic subsampling power analysis\n")
    print("Workflow: `scripts/run_sweep.py --mode subsample "
          "--synthetic-n-snp ... --phenos <trait seeds> --sample-sizes ...` "
          "— the synthetic analog of the reference's 21-trait x 8-size x "
          "5-seed cohort subsampling suite (reference kgwas_data.py:367-389, "
          "demo/kgwas_subsampling.ipynb), run end-to-end through the full "
          "KGWAS pipeline (KG compile -> train -> SR calibration -> "
          "mega-clump loci).\n")
    for pheno in sorted(by_trait):
        rows = sorted(by_trait[pheno])
        gold = [j for n, s, j in rows if n == args.ref_n]
        if not gold:
            print(f"(trait {pheno}: no gold run at N={args.ref_n}, skipped)")
            continue
        gold_j = gold[0]
        gold_loci = [tuple(x) for x in gold_j["gwas_loci"]]
        print(f"\n## Trait seed {pheno} (gold: N={args.ref_n}, "
              f"{len(gold_loci)} GWAS loci, {gold_j['n_causal']} causal "
              "SNPs)\n")
        print("| N | seed | GWAS hits | KGWAS hits | GWAS loci | KGWAS loci "
              "| KGWAS loci replicated in gold | causal found GWAS | causal "
              "found KGWAS |")
        print("|---|---|---|---|---|---|---|---|---|")
        for n, seed, j in rows:
            kg_loci = [tuple(x) for x in j["kgwas_loci"]]
            rep = replicated(kg_loci, gold_loci)
            print(f"| {n} | {seed} | {j['gwas_hits_5e8']} | "
                  f"{j['kgwas_hits_5e8']} | {len(j['gwas_loci'])} | "
                  f"{len(kg_loci)} | {rep}/{len(kg_loci)} | "
                  f"{j['gwas_causal_recovered']}/{j['n_causal']} | "
                  f"{j['kgwas_causal_recovered']}/{j['n_causal']} |")


if __name__ == "__main__":
    main()
