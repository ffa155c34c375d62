"""kgwas-tpu command-line interface.

The reference library has no CLI (SURVEY.md section 1: only the offline
gwas/classic_gwas_eval.py argparse driver). This CLI exposes the full
workflow: train, predict, interpret, magma, classic-gwas, bench.

    python -m kgwas_tpu.cli train --data-path ./data --gwas sumstats.fastGWA
    python -m kgwas_tpu.cli interpret --data-path ./data --model-name exp
    python -m kgwas_tpu.cli classic-gwas --engine auto --bfile ... --pheno ...
"""
from __future__ import annotations

import argparse
import json
import os
import sys



def _add_data_args(p):
    p.add_argument("--data-path", default="./data/")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--snp-emb", default="enformer")
    p.add_argument("--go-emb", default="random")
    p.add_argument("--gene-emb", default="esm")
    p.add_argument("--sample-edges", action="store_true")
    p.add_argument("--sample-ratio", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)


def _load_data(args, need_gwas=True):
    from kgwas_tpu import KGWAS_Data

    if args.synthetic:
        data = KGWAS_Data.from_synthetic(
            n_snp=2000, n_gene=400, n_go=150, seed=args.seed,
            data_path=args.data_path,
        )
        if need_gwas:
            data.load_synthetic_gwas(seed=args.seed)
    else:
        data = KGWAS_Data(data_path=args.data_path)
        data.load_kg(
            snp_init_emb=args.snp_emb,
            go_init_emb=args.go_emb,
            gene_init_emb=args.gene_emb,
            sample_edges=args.sample_edges,
            sample_ratio=args.sample_ratio,
        )
        if need_gwas:
            if getattr(args, "gwas", None):
                data.load_external_gwas(path=args.gwas, seed=args.seed)
            else:
                data.load_external_gwas(example_file=True, seed=args.seed)
    if need_gwas:
        data.process_gwas_file()
        data.prepare_split()
    return data


def cmd_train(args):
    if getattr(args, "watchdog_timeout", 0) and not os.environ.get(
        "KGWAS_UNDER_WATCHDOG"
    ):
        # relaunch THIS command under the stall watchdog (recovers wedged
        # accelerator claims that hang without raising). Pair with
        # --checkpoint-every/--resume to resume rather than restart.
        import sys
        import tempfile

        from kgwas_tpu.engine.watchdog import run_with_watchdog

        hb = os.path.join(tempfile.mkdtemp(prefix="kgwas_wd_"), "heartbeat")
        env = dict(os.environ, KGWAS_UNDER_WATCHDOG="1",
                   KGWAS_HEARTBEAT=hb)
        return run_with_watchdog(
            [sys.executable, "-m", "kgwas_tpu.cli"] + args.raw_argv,
            heartbeat=hb,
            stall_timeout_s=args.watchdog_timeout,
            max_restarts=args.watchdog_restarts,
            env=env,
        )

    from kgwas_tpu import KGWAS

    data = _load_data(args)
    run = KGWAS(data, exp_name=args.name, seed=args.seed,
                weight_bias_track=args.wandb)
    run.initialize_model(
        gnn_num_layers=args.layers,
        gnn_hidden_dim=args.hidden,
        gnn_backbone=args.backbone,
        gnn_aggr=args.aggr,
        gat_num_head=args.heads,
        compute_dtype=args.dtype,
        use_pallas=args.pallas,
        remat=args.remat,
        matmul_precision="default" if args.dtype == "bfloat16" else "highest",
    )
    res = run.train(
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        epoch=args.epochs,
        profile_dir=args.profile_dir,
        metrics_log=args.metrics_log,
        mesh=args.mesh or None,
        heartbeat_path=os.environ.get("KGWAS_HEARTBEAT"),
    )
    print(res[["ID", "P", "pred", "KGWAS_P"]].head())
    print(json.dumps({"test_metrics": run.test_metrics,
                      "scale_factor": run.scale_factor}))


def cmd_predict(args):
    from kgwas_tpu import KGWAS

    data = _load_data(args, need_gwas=False)
    run = KGWAS(data, exp_name=args.name)
    run.load_pretrained(os.path.join(args.data_path, "model", args.name))
    pred = run.predict_all()
    import numpy as np

    out = args.out or "predictions.npy"
    np.save(out, pred)
    print(f"saved {len(pred)} per-SNP predictions to {out}")


def cmd_interpret(args):
    from kgwas_tpu import KGWAS

    data = _load_data(args)
    run = KGWAS(data, exp_name=args.name)
    run.load_pretrained(os.path.join(args.data_path, "model", args.name))
    net, variants, dcn = run.get_disease_critical_network(
        variant_threshold=args.variant_threshold,
        magma_path=args.magma_results,
        num_cpus=args.num_cpus,
    )
    dcn.to_csv(args.out, index=False)
    print(f"disease critical network ({len(dcn)} rows) -> {args.out}")


def cmd_magma(args):
    from kgwas_tpu import KGWAS

    data = _load_data(args, need_gwas=False)
    run = KGWAS(data, exp_name=args.name)
    run.load_pretrained(os.path.join(args.data_path, "model", args.name))
    run.run_magma(args.magma_bin, args.bfile)


def cmd_classic_gwas(args):
    from kgwas_tpu.external.gwas_runner import GwasToolConfig, run_classic_gwas

    cfg = GwasToolConfig(
        bfile=args.bfile,
        result_dir=args.result_dir,
        covar_file=args.covar,
        grm_sparse=args.grm,
        plink2_bin=args.plink2_bin,
        gcta_bin=args.gcta_bin,
        threads=args.threads,
    )
    df = run_classic_gwas(cfg, args.pheno, args.name, args.sample_size,
                          binary=args.binary)
    out = os.path.join(args.result_dir, args.name + ".sumstats.tsv")
    df.to_csv(out, sep="\t", index=False)
    print(f"sumstats ({len(df)} SNPs) -> {out}")


def cmd_bench(args):
    os.environ.setdefault("BENCH_STEPS", str(args.steps))
    from .bench_lib import main as bench_main

    bench_main()


# standard shapes worth pre-compiling: (n_snp, hidden) of the offline demo,
# the calibration protocol (scripts/run_calibration.py), and the driver bench
_WARM_SHAPES = {
    "demo": dict(n_snp=2_000, hidden=128),
    "calib": dict(n_snp=50_000, hidden=128),
    "bench": dict(n_snp=200_000, hidden=128),
}


def cmd_warm_cache(args):
    """Populate the persistent XLA compilation cache for the standard
    shapes, so later cold starts (new processes, cron jobs, elastic
    restarts) deserialize instead of recompiling. TPU compiles of the
    bench shape run minutes; a warmed cache cuts that to seconds.
    Requires KGWAS_TPU_CACHE_DIR (the cache is opt-in since round 5 —
    cross-machine XLA:CPU AOT loads can segfault; utils.py)."""
    import os as _os
    import time

    if not _os.environ.get("KGWAS_TPU_CACHE_DIR"):
        raise SystemExit(
            "warm-cache needs KGWAS_TPU_CACHE_DIR set (the persistent "
            "compilation cache is opt-in; see "
            "utils.enable_persistent_compilation_cache)")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .config import ModelConfig
    from .engine.loop import build_optimizer, make_train_step
    from .graph import compile_graph, make_synthetic_kg
    from .models import init_hetero_gnn

    for name in args.shapes:
        spec = _WARM_SHAPES[name]
        n_snp = spec["n_snp"]
        t0 = time.time()
        g = make_synthetic_kg(
            n_snp=n_snp, n_gene=max(n_snp // 10, 40),
            n_go=max(n_snp // 17, 20), snp_dim=20, gene_dim=128, go_dim=128,
            avg_degree=6, seed=0)
        from .ops.pallas_segment import BN

        cg = compile_graph(g, edge_pad_multiple=8192,
                           node_pad_multiple=max(256, BN))
        cfg = ModelConfig(
            gnn_hidden_dim=spec["hidden"], gnn_num_layers=2,
            use_pallas=jax.default_backend() == "tpu")
        meta = cg.meta()
        params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta,
                                 20, 128, 128)
        arrays = jax.device_put(cg.arrays())
        optimizer = build_optimizer(1e-4, 5e-4)
        opt_state = optimizer.init(params)
        step = make_train_step(cfg, meta, optimizer)
        n_pad = cg.padded_nodes["SNP"]
        y = jnp.zeros(n_pad, jnp.float32)
        w = jnp.ones(n_pad, jnp.float32)
        idx = jnp.zeros(512, jnp.int32)
        params, opt_state, loss = step(params, opt_state, arrays, idx, y, w)
        _ = float(loss)
        print(f"[warm-cache] {name} (n_snp={n_snp}): train step compiled "
              f"in {time.time() - t0:.1f}s")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kgwas-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train KGWAS and emit KGWAS_P sumstats")
    _add_data_args(t)
    t.add_argument("--gwas", help="path to GWAS sumstats (.fastGWA etc.)")
    t.add_argument("--name", default="KGWAS")
    t.add_argument("--layers", type=int, default=2)
    t.add_argument("--hidden", type=int, default=128)
    t.add_argument("--backbone", default="GAT",
                   choices=["GAT", "SAGE", "GCN", "SGC"])
    t.add_argument("--aggr", default="sum")
    t.add_argument("--heads", type=int, default=1)
    t.add_argument("--epochs", type=int, default=10)
    t.add_argument("--batch-size", type=int, default=512)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--weight-decay", type=float, default=5e-4)
    t.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    t.add_argument("--pallas", action="store_true")
    t.add_argument("--remat", action="store_true")
    t.add_argument("--wandb", action="store_true")
    t.add_argument("--profile-dir")
    t.add_argument("--metrics-log")
    t.add_argument("--watchdog-timeout", type=float, default=0,
                   help="stall watchdog: kill+restart training if no "
                        "step progress for this many seconds (0 = off)")
    t.add_argument("--watchdog-restarts", type=int, default=2)
    t.add_argument("--mesh", type=int, default=0,
                   help="data-parallel device count (0 = single device)")
    t.set_defaults(fn=cmd_train)

    p = sub.add_parser("predict", help="per-SNP predictions from a checkpoint")
    _add_data_args(p)
    p.add_argument("--name", default="KGWAS")
    p.add_argument("--out")
    p.set_defaults(fn=cmd_predict)

    i = sub.add_parser("interpret", help="disease critical network")
    _add_data_args(i)
    i.add_argument("--name", default="KGWAS")
    i.add_argument("--variant-threshold", type=float, default=5e-8)
    i.add_argument("--magma-results")
    i.add_argument("--num-cpus", type=int, default=1)
    i.add_argument("--out", default="disease_critical_network.csv")
    i.set_defaults(fn=cmd_interpret)

    m = sub.add_parser("magma", help="MAGMA gene analysis on KGWAS output")
    _add_data_args(m)
    m.add_argument("--name", default="KGWAS")
    m.add_argument("--magma-bin", required=True)
    m.add_argument("--bfile", required=True)
    m.set_defaults(fn=cmd_magma)

    c = sub.add_parser("classic-gwas", help="run PLINK2/fastGWA upstream GWAS")
    c.add_argument("--bfile", required=True)
    c.add_argument("--pheno", required=True)
    c.add_argument("--name", default="gwas")
    c.add_argument("--result-dir", default="./gwas_results/")
    c.add_argument("--covar")
    c.add_argument("--grm")
    c.add_argument("--sample-size", type=int, required=True)
    c.add_argument("--binary", action="store_true")
    c.add_argument("--plink2-bin", default="plink2")
    c.add_argument("--gcta-bin", default="gcta64")
    c.add_argument("--threads", type=int, default=20)
    c.set_defaults(fn=cmd_classic_gwas)

    wc = sub.add_parser(
        "warm-cache",
        help="pre-compile standard shapes into the persistent XLA cache")
    wc.add_argument("--shapes", nargs="+", default=["demo", "calib"],
                    choices=sorted(_WARM_SHAPES))
    wc.set_defaults(fn=cmd_warm_cache)

    b = sub.add_parser("bench", help="one-chip throughput benchmark")
    b.add_argument("--steps", type=int, default=20)
    b.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    # keep the ACTUAL argv for self-relaunch (sys.argv is wrong when main()
    # is called programmatically with an explicit list)
    args.raw_argv = list(argv) if argv is not None else sys.argv[1:]
    args.fn(args)


if __name__ == "__main__":
    main()
