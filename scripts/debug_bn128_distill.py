"""Distill the BN=128 composed-program failure to a minimal repro.

Round-2 state (scripts/debug_bn128_repro.py): with KGWAS_PALLAS_BN=128 the
composed 2-layer train step dies with an opaque 'TPU backend error
(Internal)' above ~25-50k SNPs; every kernel passes in isolation; BN=256
runs the identical program. This harness bisects the smallest composition
that flips: K chained fused_gat_layer calls on an R-row synthetic stream,
forward-only vs value_and_grad, one config per SUBPROCESS (a backend
crash can wedge the client process).

Run on TPU: python scripts/debug_bn128_distill.py
Single trial: python scripts/debug_bn128_distill.py CHILD <rows> <calls> <grad>
"""
import os
import subprocess
import sys

CHILD = len(sys.argv) > 1 and sys.argv[1] == "CHILD"
if CHILD:
    os.environ["KGWAS_PALLAS_BN"] = os.environ.get("KGWAS_PALLAS_BN", "128")


def child(rows: int, calls: int, grad: bool):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from kgwas_tpu.ops.pallas_gat_layer import fused_gat_layer
    from kgwas_tpu.ops.pallas_segment import BN

    d = 128
    avg_deg = 6
    e = rows * avg_deg
    rng = np.random.default_rng(0)
    dst = np.sort(rng.integers(0, rows, e)).astype(np.int32)
    row_offsets = np.searchsorted(dst, np.arange(rows + 1)).astype(np.int32)
    assert rows % 256 == 0
    tile2rel = np.zeros(rows // BN, np.int32)
    msgs = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32))
    att = jnp.asarray(rng.normal(size=(1, d)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(rows,)).astype(np.float32))

    def chain(msgs, att, a_dst):
        out = None
        for _ in range(calls):
            m = msgs if out is None else msgs * (1.0 + 0.0 * out[0, 0])
            out = fused_gat_layer(m, att, a_dst, dst, row_offsets, tile2rel,
                                  rows, 0.2, 1.0)
        return jnp.sum(out)

    if grad:
        val, _ = jax.jit(jax.value_and_grad(chain, argnums=(0, 1, 2)))(
            msgs, att, a_dst)
    else:
        val = jax.jit(chain)(msgs, att, a_dst)
    print("OK", float(val), flush=True)


def main():
    if CHILD:
        child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4] == "1")
        return
    results = []
    for rows in (25_600, 102_400, 409_600):
        for calls in (1, 2, 4):
            for grad in (False, True):
                cmd = [sys.executable, os.path.abspath(__file__), "CHILD",
                       str(rows), str(calls), "1" if grad else "0"]
                env = dict(os.environ, KGWAS_PALLAS_BN="128",
                           PYTHONWARNINGS="ignore")
                try:
                    r = subprocess.run(cmd, capture_output=True, text=True,
                                       timeout=600, env=env)
                    ok = r.returncode == 0 and "OK" in r.stdout
                    tail = (r.stdout + r.stderr).strip().splitlines()
                    tail = tail[-1][:120] if tail else ""
                except subprocess.TimeoutExpired:
                    ok, tail = False, "TIMEOUT"
                results.append((rows, calls, grad, ok, tail))
                print(f"rows={rows:>7} calls={calls} grad={int(grad)} "
                      f"-> {'ok' if ok else 'FAIL'}  {'' if ok else tail}",
                      flush=True)
    fails = [r for r in results if not r[3]]
    if fails:
        rows, calls, grad, _, _ = min(
            fails, key=lambda r: (r[0], r[1], r[2]))
        print(f"\nMINIMAL FAILING CONFIG: rows={rows} calls={calls} "
              f"grad={grad} (BN=128, single fused_gat_layer op)")
    else:
        print("\nNo failure reproduced at kernel level — the trigger needs "
              "the composed multi-group model program.")


if __name__ == "__main__":
    main()
