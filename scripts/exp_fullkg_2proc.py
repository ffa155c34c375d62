"""Full-KG sharded-path execution at 2M SNPs on a 2-process CPU rig
(VERDICT r4 item 7).

Round 4's virtual-mesh ladder passed at 50k/500k but aborted at 2M on
XLA:CPU's hardcoded ~40 s in-process collective rendezvous (N virtual
devices emulated by one straggling thread pool — benchmarks/RESULTS.md).
This driver takes the verdict's suggested workaround: TWO jax.distributed
processes x one CPU device each (tests/multihost_worker.py with MH_* scale
overrides), so every collective crosses the PROCESS boundary through the
distributed CPU collectives instead of the in-process rendezvous.

Run: python scripts/exp_fullkg_2proc.py   (env: FULLKG_N_SNP, MH_HIDDEN,
MH_STEPS, MH_NODE_PAD, MH_STREAM_DTYPE, MH_REMAT)
"""
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main():
    n_snp = int(os.environ.get("FULLKG_N_SNP", 2_000_000))
    out = os.path.join("/tmp", f"fullkg_2proc_{n_snp}.json")
    if os.path.exists(out):
        os.remove(out)
    env = dict(os.environ)
    env.setdefault("MH_N_SNP", str(n_snp))
    env.setdefault("MH_LOCAL_DEVICES", "1")
    env.setdefault("MH_HIDDEN", "128")
    env.setdefault("MH_STEPS", "3")
    # node pad must be a multiple of the kernel tile BN (512 default);
    # leave unset to let the worker derive it from KGWAS_PALLAS_BN
    port = free_port()
    t0 = time.time()
    # worker output goes to FILES: two lockstep distributed workers on
    # sequential communicate() PIPEs can deadlock (an undrained pipe
    # blocks worker 1's print, worker 0 then blocks in the collective)
    logs = [open(f"/tmp/fullkg_2proc_w{pid}.log", "w") for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), out],
            env=env, stdout=logs[pid], stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    for p in procs:
        p.wait()
    for f in logs:
        f.close()
    for i, p in enumerate(procs):
        with open(f"/tmp/fullkg_2proc_w{i}.log") as f:
            tail = f.read()[-4000:]
        print(f"--- worker {i} (rc={p.returncode}) tail:\n{tail}\n",
              flush=True)
    if any(p.returncode != 0 for p in procs):
        raise SystemExit("worker failed")
    with open(out) as f:
        res = json.load(f)
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
