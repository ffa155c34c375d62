"""Driver benchmark entry point: prints ONE JSON line (see kgwas_tpu/bench_lib.py)."""
from kgwas_tpu.bench_lib import main

if __name__ == "__main__":
    main()
