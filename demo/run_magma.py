"""MAGMA gene-level analysis on KGWAS output (mirror of reference
demo/run_magma.ipynb)."""
import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", default="./data/")
    ap.add_argument("--model-name", default="kgwas_101")
    ap.add_argument("--magma-bin", required=True)
    ap.add_argument("--bfile", required=True,
                    help="PLINK bfile prefix for the reference panel")
    args = ap.parse_args()

    from kgwas_tpu import KGWAS, KGWAS_Data

    data = KGWAS_Data(data_path=args.data_path, offline=True)
    run = KGWAS(data, exp_name=args.model_name)
    run.load_pretrained(os.path.join(args.data_path, "model", args.model_name))
    out_prefix = run.run_magma(args.magma_bin, args.bfile)
    print("MAGMA output prefix:", out_prefix)


if __name__ == "__main__":
    main()
