"""Regenerate the protocol-scale section of benchmarks/CALIBRATION.md from
the per-seed JSONs written by scripts/run_calibration.py (resumable runs ->
the summary is always recomputable from artifacts)."""
import json
import os
import sys

import numpy as np

out_dir = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/calib_v2"
rows = []
for fn in sorted(os.listdir(out_dir)):
    if fn.endswith(".json"):
        rows.append(json.load(open(os.path.join(out_dir, fn))))

for arm in ("null", "causal"):
    sub = [r for r in rows if r["arm"] == arm]
    if not sub:
        continue
    gl = np.array([r["gwas_loci"] for r in sub])
    kl = np.array([r["kgwas_loci"] for r in sub])
    gh = np.array([r["gwas_hits"] for r in sub])
    kh = np.array([r["kgwas_hits"] for r in sub])
    w = np.array([r["wall_s"] for r in sub])
    print(f"{arm}: n={len(sub)}")
    print(f"  loci  GWAS mean={gl.mean():.3f} max={gl.max()}  "
          f"KGWAS mean={kl.mean():.3f} max={kl.max()}  "
          f"seeds with KGWAS loci>0: {(kl > 0).sum()}")
    print(f"  hits  GWAS mean={gh.mean():.2f}  KGWAS mean={kh.mean():.2f}")
    print(f"  wall  mean={w.mean():.1f}s total={w.sum()/60:.1f}min")
    if arm == "causal":
        tg = np.array([r["gwas_true_pos"] for r in sub])
        tk = np.array([r["kgwas_true_pos"] for r in sub])
        fg = np.array([r["gwas_false_pos"] for r in sub])
        fk = np.array([r["kgwas_false_pos"] for r in sub])
        print(f"  power TP of {sub[0]['n_causal']} causal: GWAS "
              f"mean={tg.mean():.1f}  KGWAS mean={tk.mean():.1f}")
        print(f"  FP among hits: GWAS mean={fg.mean():.2f} "
              f"KGWAS mean={fk.mean():.2f}")
