"""End-to-end KGWAS workflow (mirror of reference demo/kgwas_101.ipynb).

Runs against the real data bundle when present at --data-path, otherwise
falls back to the fully-offline synthetic KG so the demo always executes.
"""
import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", default="./data/")
    ap.add_argument("--synthetic", action="store_true",
                    help="force the offline synthetic KG")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--sample-ratio", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from kgwas_tpu import KGWAS, KGWAS_Data

    have_real = os.path.exists(
        os.path.join(args.data_path, "cell_kg/network/edge_index.pkl")
    )
    if args.synthetic or not have_real:
        print("[demo] using synthetic KG (pass --data-path with the real "
              "bundle for the full demo)")
        data = KGWAS_Data.from_synthetic(
            n_snp=2000, n_gene=400, n_go=150, seed=args.seed,
            data_path=args.data_path,
        )
        data.load_synthetic_gwas(seed=args.seed)
    else:
        data = KGWAS_Data(data_path=args.data_path)
        # fast-mode demo config (reference kgwas_data.py:112-116,261-268)
        data.load_kg(
            snp_init_emb="random", go_init_emb="random", gene_init_emb="random",
            sample_edges=True, sample_ratio=args.sample_ratio,
        )
        data.load_external_gwas(example_file=True)

    data.process_gwas_file()
    data.prepare_split()

    run = KGWAS(data, exp_name="kgwas_101", seed=args.seed)
    run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=args.hidden)
    res = run.train(batch_size=args.batch_size, epoch=args.epochs)

    print(res[["ID", "P", "pred", "P_weighted", "KGWAS_P"]].head(10))
    print(f"[demo] scale factor: {run.scale_factor:.4f}")
    print(f"[demo] test metrics: {run.test_metrics}")

    # reload round-trip (reference load_pretrained path)
    run2 = KGWAS(data, exp_name="reload", seed=args.seed)
    run2.load_pretrained(os.path.join(data.data_path, "model", "kgwas_101"))
    print("[demo] reloaded checkpoint OK")


if __name__ == "__main__":
    main()
