"""Driver benchmark entry point: prints ONE JSON line (see kgwas_tpu/bench_lib.py)."""
import os

if __name__ == "__main__":
    # Bench defaults (overridable): BN=512 kernel tiles measured +5.4% over
    # BN=256 at 200k SNPs (halved fragment-padding read amplification —
    # benchmarks/RESULTS.md round 4 "BN=512 evidence"). Requires node rows
    # padded to BN. The PACKAGE default stays BN=256 (conservative; golden
    # fixtures and parity tests anchor there); the effective BN/node_pad are
    # echoed in the emitted JSON so results are self-describing. Set here,
    # under __main__ only, BEFORE kgwas_tpu imports pin BN — importing
    # bench.py as a module mutates nothing.
    os.environ.setdefault("KGWAS_PALLAS_BN", "512")
    os.environ.setdefault("BENCH_NODE_PAD", os.environ["KGWAS_PALLAS_BN"])

    from kgwas_tpu.bench_lib import main

    main()
