"""Op-level profile of the composed train step at bench scale.

Composed-step A/Bs have stopped resolving (~139 ms regardless of backward
kernel changes), so this captures a jax.profiler trace of a few steps and
aggregates device-lane op durations to show where the time actually goes.

Run: python scripts/exp_trace_step.py  (TPU)
"""
import glob
import gzip
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

_NODE_PAD = max(256, _TILE_BN)  # follow the shipped tile default (BN=512)

from kgwas_tpu.engine.loop import build_optimizer, make_train_step
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    n_snp = int(os.environ.get("TRACE_N_SNP", 200_000))
    g = make_synthetic_kg(n_snp=n_snp, n_gene=n_snp // 10, n_go=n_snp // 17,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    extra = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=")
        extra[k] = json.loads(v)
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                      matmul_precision="highest", use_pallas=True, **extra)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)
    arrays = jax.device_put(cg.arrays())
    rng = np.random.default_rng(0)
    n_pad = cg.padded_nodes["SNP"]
    y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    w = jnp.ones(n_pad, jnp.float32)
    bidx = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512), jnp.int32)

    optimizer = build_optimizer(1e-4, 5e-4)
    opt_state = optimizer.init(params)
    train_step = make_train_step(cfg, meta, optimizer)
    p, o = params, opt_state
    for _ in range(3):  # compile + warm
        p, o, loss = train_step(p, o, arrays, bidx, y, w)
    jax.block_until_ready(loss)

    log_dir = "/tmp/kgwas_trace"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    for _ in range(3):
        p, o, loss = train_step(p, o, arrays, bidx, y, w)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()

    files = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        print("NO TRACE PRODUCED")
        return
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # device lanes: pick pids whose process name mentions TPU/device
    pid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    print("processes:", pid_names, flush=True)
    agg = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            agg[name] = agg.get(name, 0.0) + e.get("dur", 0)
    total = sum(agg.values())
    print(f"total device time: {total/1e3/3:.2f} ms/step over 3 steps")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3/3:9.3f} ms/step  {name[:110]}")

    # -- glue attribution: bucket EVERY op by family, and map the top
    # fusions to their HLO bodies so the tail is attributable --
    import collections
    import re

    fam = collections.Counter()
    for name, dur in agg.items():
        if name.startswith("jit_train_step") or name in ("0", "1", "2"):
            continue  # step envelope / per-step lanes, double counts
        base = re.sub(r"[.\d]+$", "", name)
        fam[base] += dur
    print("\n-- op families (ms/step, full tail) --")
    for base, dur in fam.most_common(30):
        print(f"{dur/1e3/3:9.3f}  {base[:90]}")

    if os.environ.get("TRACE_HLO", "1") == "1":
        txt = train_step.lower(
            p, o, arrays, bidx, y, w).compile().as_text()
        with open("/tmp/step_hlo.txt", "w") as f:
            f.write(txt)
        bodies = {}
        for line in txt.splitlines():
            if "fusion(" in line:
                mname = re.search(r"%?([\w.\-]+) = ", line)
                calls = re.search(r"calls=%?([\w.\-]+)", line)
                if mname and calls:
                    bodies[mname.group(1)] = calls.group(1)
        comp_root, cur = {}, None
        for line in txt.splitlines():
            m = re.match(r"%?([\w.\-]+)\s*\(", line)
            if m and not line.startswith(" "):
                cur = m.group(1)
            if cur and "ROOT" in line:
                comp_root[cur] = line.strip()[:200]
        print("\n-- top-fusion HLO roots --")
        shown = 0
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1]):
            key = name.split("(")[0]
            if key in bodies and shown < 25:
                root = comp_root.get(bodies[key], "?")
                print(f"{dur/1e3/3:9.3f}  {key}: {root}")
                shown += 1

        # -- glue attribution by HLO metadata: every instruction carries
        # op_name/source_file; attribute each traced op (fusion or not) to
        # the dominant (source_file, transform) of its computation body,
        # then bucket: kernels / takes / concats / optimizer / encoder-MLP /
        # loss / other. This prices the "~24 ms model/optimizer/glue"
        # bucket per-op (VERDICT r3 item 2). --
        comp_insts = collections.defaultdict(list)  # comp -> [(opname, sf)]
        cur = None
        for line in txt.splitlines():
            m = re.match(r"%?([\w.\-]+)\s*\(", line)
            if m and not line.startswith(" "):
                cur = m.group(1)
            if cur is None:
                continue
            mo = re.search(r'op_name="([^"]*)"', line)
            sf = re.search(r'source_file="([^"]*)"', line)
            if mo:
                comp_insts[cur].append(
                    (mo.group(1), sf.group(1) if sf else ""))

        def classify(opname, sf):
            if "pallas" in opname or "tpu_custom_call" in opname:
                return "pallas-kernels"
            if "_take" in opname or ("gather" in opname and
                                     "pallas_gat_layer" in sf):
                return "take/gather"
            if "concatenate" in opname:
                return "concat"
            if "optim" in sf or "optax" in sf or "adam" in opname.lower():
                return "optimizer"
            if "mlp.py" in sf:
                return "encoder-mlp"
            if "loop.py" in sf:
                return "loss/step-glue"
            if "hetero_gnn" in sf or "convs" in sf:
                return "model-glue"
            if "pallas" in sf or "segment" in sf:
                return "kernel-glue"
            return f"other({os.path.basename(sf) or '?'})"

        def attrib_op(trace_name):
            key = trace_name.split("(")[0]
            comp = bodies.get(key, key)
            insts = comp_insts.get(comp) or comp_insts.get(key)
            if not insts:
                # non-fusion op: find its own metadata line by name
                mm = re.search(
                    rf"%{re.escape(key)} = .*?"
                    rf'op_name="([^"]*)"(?:.*?source_file="([^"]*)")?',
                    txt)
                if mm:
                    return classify(mm.group(1), mm.group(2) or "")
                return "unattributed"
            votes = collections.Counter(
                classify(o, s) for o, s in insts)
            return votes.most_common(1)[0][0]

        buckets = collections.Counter()
        detail = collections.defaultdict(list)
        for name, dur in agg.items():
            if name.startswith("jit_train_step") or name in ("0", "1", "2"):
                continue
            b = attrib_op(name)
            buckets[b] += dur
            detail[b].append((dur, name))
        print("\n-- glue attribution (ms/step, by dominant HLO source) --")
        for b, dur in buckets.most_common():
            print(f"{dur/1e3/3:9.3f}  {b}")

        def op_meta(trace_name):
            key = trace_name.split("(")[0]
            comp = bodies.get(key, key)
            insts = comp_insts.get(comp) or comp_insts.get(key) or []
            votes = collections.Counter(
                f"{o.split('/')[-1]} @{os.path.basename(s)}"
                for o, s in insts)
            return "; ".join(f"{k}x{v}" for k, v in votes.most_common(3))

        print("\n-- per-bucket top ops --")
        for b in ("take/gather", "model-glue", "concat", "encoder-mlp",
                  "optimizer"):
            print(f"[{b}]")
            for dur, name in sorted(detail.get(b, []), reverse=True)[:14]:
                print(f"  {dur/1e3/3:8.3f}  {name[:40]:40s} "
                      f"{op_meta(name)[:130]}")


if __name__ == "__main__":
    main()
