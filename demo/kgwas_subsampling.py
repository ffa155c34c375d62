"""Subsampled-cohort power analysis (mirror of reference
demo/kgwas_subsampling.ipynb): for trait x sample-size x seed, train KGWAS on
subsampled sumstats and count independent loci at 5e-8 replicated in the
full-cohort gold GWAS.
"""
import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", default="./data/")
    ap.add_argument("--pheno", default="biochemistry_Creatinine")
    ap.add_argument("--sample-sizes", type=int, nargs="+", default=[5000])
    ap.add_argument("--seeds", type=int, nargs="+", default=[1])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--out", default="subsampling_results.json")
    args = ap.parse_args()

    from kgwas_tpu import KGWAS, KGWAS_Data
    from kgwas_tpu.stats.clumps import (
        get_clumps_gold_label,
        get_curve,
        get_mega_clump_query,
        get_meta_clumps,
    )

    results = []
    for sample_size in args.sample_sizes:
        for seed in args.seeds:
            data = KGWAS_Data(data_path=args.data_path)
            data.load_kg(snp_init_emb="enformer", go_init_emb="random",
                         gene_init_emb="esm")
            data.load_gwas_subsample(args.pheno, sample_size, seed)
            data.process_gwas_file()
            data.prepare_split()
            run = KGWAS(
                data, exp_name=f"{args.pheno}_{sample_size}_{seed}", seed=seed
            )
            run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=args.hidden)
            res = run.train(epoch=args.epochs)

            # gold = full-cohort GWAS mega-clumps
            gold_data = KGWAS_Data(data_path=args.data_path)
            gold_data.idx2id = data.idx2id
            gold_data.id2idx = data.id2idx
            gold_data.load_full_gwas(args.pheno)
            gold = gold_data.lr_uni.rename(columns={"ID": "SNP"})
            gold_clumps = get_clumps_gold_label(args.data_path, gold)
            gold_mega, gold_rsid, _ = get_meta_clumps(gold_clumps, args.data_path)

            ranked = res.sort_values("KGWAS_P")
            hits = ranked[ranked.KGWAS_P < 5e-8].ID.values
            _, pred_rsid, _ = get_mega_clump_query(
                args.data_path, gold_clumps, hits
            )
            recall_k, precision_k, _ = get_curve(
                list(pred_rsid.values()), list(gold_rsid.values())
            )
            k = len(pred_rsid)
            row = {
                "pheno": args.pheno,
                "sample_size": sample_size,
                "seed": seed,
                "kgwas_loci": k,
                "recall_at_k": recall_k.get(k, 0),
                "precision_at_k": precision_k.get(k, 0),
            }
            print(row)
            results.append(row)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
