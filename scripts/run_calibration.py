"""Protocol-scale statistical calibration (VERDICT r3 item 3).

Mirror of the reference's null/causal simulation analysis
(/root/reference/demo/kgwas_simulation.ipynb cells 5-12; seed generator
reference kgwas_data.py:275-294) at honest scale on one chip:

  * NULL arm (>=100 seeds): one fixed 50k-SNP KG; per seed, a fresh pure-
    null sumstats draw (z ~ N(0,1), zero causal SNPs), the FULL pipeline
    (process_gwas_file -> prepare_split -> 10-epoch train -> SR +
    calibration), then false-positive counts at P < 5e-8 — both raw SNPs
    and INDEPENDENT LOCI (mega-clumps, 0.1 cM merge, the reference's
    counting unit, reference eval_utils.py:58-99).
  * CAUSAL arm: per-seed sumstats with n_snp/20 causal SNPs (z boosted
    +4 sigma); power = causal SNPs recovered among KGWAS hits vs GWAS hits.

The KG is FIXED across seeds (as in the reference: one real KG, many
simulated phenotypes) — this also keeps compile shapes identical, so the
per-seed cost after seed 1 is pure train time. One JSON per seed in
--out-dir makes reruns resume.

Run (TPU, ~1-2 h for 100 null + 20 causal):
    python scripts/run_calibration.py --null-seeds 100 --causal-seeds 20
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def count_loci(res, p_col, sumstats, t_p=5e-8):
    """Independent loci at t_p: greedy clumps (no LD panel for synthetic
    SNPs -> singleton clumps) merged into mega-clumps within 0.1 cM using
    cM = POS / 1e6 (1 cM/Mb)."""
    from kgwas_tpu.stats.clumps import build_clumps, get_meta_clumps
    import pandas as pd

    hits = res[res[p_col] < t_p]
    if not len(hits):
        return 0
    order = hits.sort_values(p_col).ID.values
    clumps = build_clumps(order, {})
    bim_df = pd.DataFrame({
        0: sumstats.CHR.values,
        1: sumstats.SNP.values,
        2: sumstats.POS.values / 1e6,
    })
    mega, _, _ = get_meta_clumps(clumps, data_path=None, bim_df=bim_df)
    return len(mega)


def run_seed(data, base_sumstats_kw, arm, seed, args):
    from kgwas_tpu import KGWAS
    from kgwas_tpu.graph.synthetic import make_synthetic_sumstats

    n_causal = 0 if arm == "null" else args.n_snp // 20
    sumstats, causal_idx = make_synthetic_sumstats(
        args.n_snp, n_causal=n_causal, seed=seed + 10_000,
        return_causal=True, **base_sumstats_kw)
    data._synth_sumstats = sumstats
    data.load_synthetic_gwas(seed=seed)
    data.process_gwas_file()
    data.prepare_split()

    run = KGWAS(data, exp_name=f"calib_{arm}_{seed}", seed=seed)
    run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=args.hidden)
    res = run.train(batch_size=args.batch_size, epoch=args.epochs,
                    save_best_model=False)

    out = {
        "arm": arm, "seed": seed,
        "gwas_hits": int((res.P < 5e-8).sum()),
        "kgwas_hits": int((res.KGWAS_P < 5e-8).sum()),
        "gwas_loci": count_loci(res, "P", sumstats),
        "kgwas_loci": count_loci(res, "KGWAS_P", sumstats),
        "scale_factor": float(getattr(run, "scale_factor", float("nan"))),
    }
    if arm == "causal":
        causal_ids = set(f"rs{i}" for i in causal_idx)
        for col, key in (("P", "gwas"), ("KGWAS_P", "kgwas")):
            hit_ids = set(res[res[col] < 5e-8].ID.values)
            out[f"{key}_true_pos"] = len(hit_ids & causal_ids)
            out[f"{key}_false_pos"] = len(hit_ids - causal_ids)
        out["n_causal"] = int(n_causal)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-snp", type=int, default=50_000)
    ap.add_argument("--null-seeds", type=int, default=100)
    ap.add_argument("--causal-seeds", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--out-dir", default="benchmarks/calib_v2")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from kgwas_tpu import KGWAS_Data

    os.makedirs(args.out_dir, exist_ok=True)
    print(f"[calib] backend={jax.default_backend()} n_snp={args.n_snp} "
          f"epochs={args.epochs} hidden={args.hidden}", flush=True)

    # ONE fixed KG for every seed (reference: one KG, many phenotypes)
    data = KGWAS_Data.from_synthetic(
        n_snp=args.n_snp, n_gene=args.n_snp // 10,
        n_go=max(args.n_snp // 17, 100), seed=0,
        data_path=os.path.join(args.out_dir, "kg"))

    jobs = [("null", s) for s in range(1, args.null_seeds + 1)] + \
           [("causal", s) for s in range(1, args.causal_seeds + 1)]
    for arm, seed in jobs:
        fp = os.path.join(args.out_dir, f"{arm}_{seed}.json")
        if os.path.exists(fp):
            continue
        t0 = time.time()
        out = run_seed(data, {}, arm, seed, args)
        out["wall_s"] = round(time.time() - t0, 1)
        with open(fp, "w") as f:
            json.dump(out, f)
        print(f"[calib] {arm} seed {seed}: gwas_loci={out['gwas_loci']} "
              f"kgwas_loci={out['kgwas_loci']} ({out['wall_s']}s)",
              flush=True)

    # summary table
    rows = []
    for fn in sorted(os.listdir(args.out_dir)):
        if fn.endswith(".json"):
            rows.append(json.load(open(os.path.join(args.out_dir, fn))))
    for arm in ("null", "causal"):
        sub = [r for r in rows if r["arm"] == arm]
        if not sub:
            continue
        gl = np.array([r["gwas_loci"] for r in sub])
        kl = np.array([r["kgwas_loci"] for r in sub])
        print(f"[calib] {arm}: {len(sub)} seeds | "
              f"GWAS loci mean={gl.mean():.3f} max={gl.max()} | "
              f"KGWAS loci mean={kl.mean():.3f} max={kl.max()}")
        if arm == "causal":
            tp_g = np.mean([r["gwas_true_pos"] for r in sub])
            tp_k = np.mean([r["kgwas_true_pos"] for r in sub])
            print(f"[calib] causal power: GWAS TP mean={tp_g:.1f} "
                  f"KGWAS TP mean={tp_k:.1f} (of {sub[0]['n_causal']})")


if __name__ == "__main__":
    main()
