"""Driver benchmark entry point: prints ONE JSON line (see kgwas_tpu/bench_lib.py)."""
import os

# Bench defaults (overridable): BN=512 kernel tiles measured +5.4% over
# BN=256 at 200k SNPs (halved fragment-padding read amplification,
# benchmarks/RESULTS.md round 3). Requires node rows padded to BN.
# The PACKAGE default stays BN=256 (conservative; golden fixtures and
# parity tests anchor there) — this is a bench-level tuning default,
# read before kgwas_tpu imports pin BN.
os.environ.setdefault("KGWAS_PALLAS_BN", "512")
os.environ.setdefault("BENCH_NODE_PAD", os.environ["KGWAS_PALLAS_BN"])

from kgwas_tpu.bench_lib import main

if __name__ == "__main__":
    main()
