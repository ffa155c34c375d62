"""Disease-critical network interpretation (mirror of reference
demo/disease_critical_network.ipynb — no PyG monkey-patch needed here: raw
attention export is a first-class forward mode)."""
import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", default="./data/")
    ap.add_argument("--model-name", default="kgwas_101")
    ap.add_argument("--variant-threshold", type=float, default=5e-8)
    ap.add_argument("--magma-path", default=None)
    ap.add_argument("--num-cpus", type=int, default=1)
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
    if have_real:
        data = KGWAS_Data(data_path=args.data_path)
        data.load_kg(snp_init_emb="random", go_init_emb="random",
                     gene_init_emb="random", sample_edges=True, sample_ratio=0.1)
        data.load_external_gwas(example_file=True)
    else:
        print("[demo] synthetic mode")
        data = KGWAS_Data.from_synthetic(
            n_snp=2000, n_gene=400, n_go=150, seed=42, data_path=args.data_path
        )
        data.load_synthetic_gwas()
    data.process_gwas_file()
    data.prepare_split()

    run = KGWAS(data, exp_name=args.model_name, seed=42)
    ckpt = os.path.join(data.data_path, "model", args.model_name)
    if os.path.exists(ckpt):
        run.load_pretrained(ckpt)
    else:
        print("[demo] no checkpoint found; training a small model first")
        run.initialize_model(gnn_hidden_dim=64)
        run.train(epoch=2, batch_size=512)

    net, variants, dcn = run.get_disease_critical_network(
        variant_threshold=args.variant_threshold,
        magma_path=args.magma_path,
        num_cpus=args.num_cpus,
    )
    print("edge-weight rows:", len(net))
    print("disease critical network:")
    print(dcn.head(20))
    print("variant interpretation rows:", len(variants))
    out = os.path.join(data.data_path, "disease_critical_network.csv")
    dcn.to_csv(out, index=False)
    print("saved to", out)


if __name__ == "__main__":
    main()
