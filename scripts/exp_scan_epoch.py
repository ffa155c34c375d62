"""A/B: per-step dispatch vs scanned multi-step dispatch (KGWAS.train
scan_steps) on the real TPU — measures end-to-end epoch wall time.

Run: python scripts/exp_scan_epoch.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgwas_tpu import KGWAS, KGWAS_Data


def run(scan_steps, tag):
    data = KGWAS_Data.from_synthetic(
        n_snp=100_000, n_gene=10_000, n_go=5_000, seed=3,
        data_path=f"/tmp/scan_ab_{tag}/")
    data.load_synthetic_gwas(seed=3)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name=f"scan_{tag}", seed=3)
    run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=128)
    run.train(batch_size=512, epoch=3, lr=1e-3, scan_steps=scan_steps,
              save_best_model=False)
    times = [h["epoch_time_s"] for h in run.train_history]
    eps = [h["edges_per_sec"] for h in run.train_history]
    print(f"scan_steps={scan_steps}: epoch_s={['%.2f' % t for t in times]} "
          f"edges/s={['%.3g' % e for e in eps]}", flush=True)


if __name__ == "__main__":
    run(1, "off")
    run(8, "on")
