"""Multi-trait / multi-seed sweep driver (the reference's subsampling and
simulation suites — 21 traits x 8 sizes x 5 seeds, 500 simulation seeds —
reference README.md:77-78, kgwas_data.py:275-294,367-389).

Sweep jobs are embarrassingly parallel at the experiment level. This driver
shards the job list across hosts (jax.process_index/process_count under
multi-host, or --host-index/--num-hosts for manual launching) and runs each
job as a full training run, writing one result JSON per job so reruns resume.
"""
import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def job_list(args):
    if args.mode == "simulation":
        seeds = range(args.seed_start, args.seed_end)
        return [("simulation", args.simulation_type, s) for s in seeds]
    combos = itertools.product(
        args.phenos, args.sample_sizes, range(args.seed_start, args.seed_end)
    )
    return [("subsample", p, n, s) for p, n, s in combos]


def loci_leads(res, p_col, t_p=5e-8):
    """Independent loci at t_p as (chrom, lead cM) pairs: greedy clumps
    (singletons without an LD panel) merged into 0.1 cM mega-clumps, the
    reference's counting unit (reference eval_utils.py:58-99). res must
    carry #CHROM / POS columns (merged from lr_uni by the caller)."""
    import pandas as pd

    from kgwas_tpu.stats.clumps import build_clumps, get_meta_clumps

    hits = res[res[p_col] < t_p]
    if not len(hits):
        return []
    order = hits.sort_values(p_col).ID.values
    clumps = build_clumps(order, {})
    bim_df = pd.DataFrame({
        0: res["#CHROM"].values,
        1: res.ID.values,
        2: res.POS.values / 1e6,
    })
    _, mega_rsids, _ = get_meta_clumps(clumps, data_path=None, bim_df=bim_df)
    id2cm = dict(zip(res.ID.values, res.POS.values / 1e6))
    id2chr = dict(zip(res.ID.values, res["#CHROM"].values))
    return sorted({(int(id2chr[ids[0]]), float(id2cm[ids[0]]))
                   for ids in mega_rsids.values()})


def run_job(job, args):
    from kgwas_tpu import KGWAS, KGWAS_Data

    if args.synthetic_n_snp:
        n = args.synthetic_n_snp
        data = KGWAS_Data.from_synthetic(
            n_snp=n, n_gene=max(n // 10, 40), n_go=max(n // 17, 20),
            snp_dim=20, gene_dim=128, go_dim=128, avg_degree=6,
            seed=0, data_path=args.data_path)
    else:
        data = KGWAS_Data(data_path=args.data_path)
        data.load_kg(
            snp_init_emb=args.snp_emb,
            go_init_emb=args.go_emb,
            gene_init_emb=args.gene_emb,
            sample_edges=args.sample_edges,
            sample_ratio=args.sample_ratio,
        )
    if job[0] == "simulation":
        _, sim_type, seed = job
        data.load_simulation_gwas(sim_type, seed)
        name = f"sim_{sim_type}_{seed}"
    elif args.synthetic_n_snp:
        _, pheno, n, seed = job
        data.load_synthetic_gwas_subsample(int(pheno), n, seed,
                                           ref_n=args.ref_n)
        name = f"syn{pheno}_{n}_{seed}"
    else:
        _, pheno, n, seed = job
        data.load_gwas_subsample(pheno, n, seed)
        name = f"{pheno}_{n}_{seed}"
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name=name, seed=job[-1])
    run.initialize_model(
        gnn_num_layers=args.layers, gnn_hidden_dim=args.hidden
    )
    train_kwargs = {}
    if getattr(args, "mesh_data", None):
        train_kwargs["mesh"] = args.mesh_data
    res = run.train(epoch=args.epochs, batch_size=args.batch_size,
                    save_best_model=False, **train_kwargs)
    out = {
        "job": list(job),
        "gwas_hits_5e8": int((res.P < 5e-8).sum()),
        "kgwas_hits_5e8": int((res.KGWAS_P < 5e-8).sum()),
        "test_metrics": run.test_metrics,
        "scale_factor": run.scale_factor,
    }
    # loci + causal-recovery accounting for the power analysis summary
    # (benchmarks/SUBSAMPLE.md); res carries #CHROM/POS from the sumstats
    out["gwas_loci"] = loci_leads(res, "P")
    out["kgwas_loci"] = loci_leads(res, "KGWAS_P")
    causal = getattr(data, "_synth_causal_idx", None)
    if causal is not None:
        causal_ids = {f"rs{i}" for i in causal}
        out["n_causal"] = len(causal_ids)
        out["gwas_causal_recovered"] = int(
            res[(res.P < 5e-8) & res.ID.isin(causal_ids)].shape[0])
        out["kgwas_causal_recovered"] = int(
            res[(res.KGWAS_P < 5e-8) & res.ID.isin(causal_ids)].shape[0])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", default="./data/")
    ap.add_argument("--out-dir", default="./sweep_results/")
    ap.add_argument("--mode", choices=["simulation", "subsample"],
                    default="simulation")
    ap.add_argument("--simulation-type", default="null")
    ap.add_argument("--phenos", nargs="+", default=["biochemistry_Creatinine"])
    ap.add_argument("--sample-sizes", type=int, nargs="+", default=[5000])
    ap.add_argument("--seed-start", type=int, default=1)
    ap.add_argument("--seed-end", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--snp-emb", default="enformer")
    ap.add_argument("--go-emb", default="random")
    ap.add_argument("--gene-emb", default="esm")
    ap.add_argument("--sample-edges", action="store_true")
    ap.add_argument("--synthetic-n-snp", type=int, default=0,
                    help="run the sweep on a synthetic KG of this many SNPs"
                         " (phenos are integer trait seeds; subsample mode"
                         " uses load_synthetic_gwas_subsample)")
    ap.add_argument("--ref-n", type=int, default=50_000,
                    help="full-cohort N for the synthetic power scaling"
                         " (the gold run is sample_size == ref_n)")
    ap.add_argument("--sample-ratio", type=float, default=1.0)
    ap.add_argument("--host-index", type=int, default=None)
    ap.add_argument("--num-hosts", type=int, default=None)
    # multi-host runtime (jax.distributed over DCN): when --coordinator is
    # given, every process joins one global mesh and trains each job
    # data-parallel over all hosts' devices (tests/test_multihost.py is the
    # CI-runnable 2-process rig for this path); without it, hosts shard the
    # JOB LIST instead (embarrassingly parallel sweeps)
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port for"
                         " jax.distributed.initialize")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--mesh-data", type=int, default=None,
                    help="train each job over a data-parallel mesh of this"
                         " size (requires --coordinator for multi-host)")
    args = ap.parse_args()

    if args.coordinator is not None:
        from kgwas_tpu.parallel.mesh import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    if args.host_index is None:
        try:
            import jax

            host_index = jax.process_index()
            num_hosts = jax.process_count()
        except Exception:
            host_index, num_hosts = 0, 1
    else:
        host_index, num_hosts = args.host_index, args.num_hosts or 1

    os.makedirs(args.out_dir, exist_ok=True)
    jobs = job_list(args)
    if args.coordinator is not None:
        # one global mesh: every process walks the SAME job list in lockstep
        my_jobs = jobs
    else:
        my_jobs = jobs[host_index::num_hosts]
    print(f"[sweep] host {host_index}/{num_hosts}: {len(my_jobs)} of "
          f"{len(jobs)} jobs")

    for job in my_jobs:
        tag = "_".join(str(x) for x in job)
        out_path = os.path.join(args.out_dir, tag + ".json")
        if os.path.exists(out_path):
            print(f"[sweep] {tag}: already done, skipping")
            continue
        result = run_job(job, args)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"[sweep] {tag}: {result}")


if __name__ == "__main__":
    main()
