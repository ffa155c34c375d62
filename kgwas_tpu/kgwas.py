"""KGWAS: training/inference engine + orchestration (user API).

API mirror of the reference orchestrator (reference kgwas/kgwas.py:25-273)
over the TPU-native stack: full-graph jitted training, functional best-model
snapshots (no deepcopy needed — params are immutable pytrees), host-side
Storey–Tibshirani reweighting + calibration, MAGMA subprocess, and
attention-based interpretation.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

from .config import ModelConfig
from .engine.checkpoint import load_model, save_model
from .engine.loop import build_optimizer, epoch_batches, make_forward, make_train_step
from .models.hetero_gnn import init_hetero_gnn
from .stats.calibration import finalize_predictions
from .utils import compute_metrics, enable_persistent_compilation_cache, print_sys


class KGWAS:
    def __init__(
        self,
        data,
        weight_bias_track: bool = False,
        device: Optional[str] = None,
        proj_name: str = "KGWAS",
        exp_name: str = "KGWAS",
        seed: int = 42,
    ):
        self.seed = seed
        self.data = data
        self.data_path = data.data_path
        self.exp_name = exp_name
        self.device = device  # jax picks the platform; kept for API parity
        enable_persistent_compilation_cache()

        if weight_bias_track:
            import wandb

            wandb.init(project=proj_name, name=exp_name)
            self.wandb = wandb
        else:
            self.wandb = False

    # ------------------------------------------------------------------ model

    def initialize_model(
        self,
        gnn_num_layers: int = 2,
        gnn_hidden_dim: int = 128,
        gnn_backbone: str = "GAT",
        gnn_aggr: str = "sum",
        gat_num_head: int = 1,
        no_relu: bool = False,
        stream_features: Optional[list] = None,
        **tpu_kwargs,
    ):
        """Defaults mirror reference kgwas/kgwas.py:52. Extra kwargs reach the
        TPU-specific ModelConfig fields (compute_dtype, remat, use_pallas...).
        stream_features: node types whose embedding tables stay host-side and
        stream to HBM per step (bigger-than-HBM pops features).

        On a TPU backend the fused Pallas kernels are enabled by default
        (3x the XLA path; see benchmarks/RESULTS.md) — pass use_pallas=False
        to opt out."""
        import jax

        if "use_pallas" not in tpu_kwargs and jax.default_backend() == "tpu":
            tpu_kwargs["use_pallas"] = True
        self.stream_features = list(stream_features or [])

        # The persisted artifact config holds every MODEL-SEMANTIC field (a
        # reload must rebuild the same function — dropping no_relu here once
        # made reloaded models silently reapply the final ReLU). Execution
        # strategy (use_pallas, compute_dtype, gather_chunk_rows, ...) is
        # deliberately NOT persisted: it is a per-backend decision re-made at
        # load time, so a TPU-trained checkpoint serves cleanly on CPU.
        _SEMANTIC_KEYS = (
            "negative_slope", "dropout", "sigmoid_gat", "temperature",
            "out_channels", "edge_dim", "pheno_condition",
        )
        self.config = {
            "gnn_num_layers": gnn_num_layers,
            "gnn_hidden_dim": gnn_hidden_dim,
            "gnn_backbone": gnn_backbone,
            "gnn_aggr": gnn_aggr,
            "gat_num_head": gat_num_head,
            "no_relu": no_relu,
            **{k: v for k, v in tpu_kwargs.items() if k in _SEMANTIC_KEYS},
        }
        self.model_cfg = ModelConfig(
            gnn_num_layers=gnn_num_layers,
            gnn_hidden_dim=gnn_hidden_dim,
            gnn_backbone=gnn_backbone,
            gnn_aggr=gnn_aggr,
            gat_num_head=gat_num_head,
            no_relu=no_relu,
            **tpu_kwargs,
        )
        cg = self.data.compile()
        self.meta = cg.meta()
        self.params = init_hetero_gnn(
            jax.random.PRNGKey(self.seed),
            self.model_cfg,
            self.meta,
            self.data.snp_init_dim_size,
            self.data.gene_init_dim_size,
            self.data.go_init_dim_size,
        )
        self.best_params = self.params
        return self

    def load_pretrained(self, path: str):
        """Load a checkpoint saved by this framework (config.pkl +
        model.npz + pred.csv; same artifact contract as reference
        kgwas.py:73-83)."""
        params, config = load_model(path)
        self.initialize_model(**config)
        self.config = config
        self.params = params
        self.best_params = params
        pred_path = os.path.join(path, "pred.csv")
        if os.path.exists(pred_path):
            self.kgwas_res = pd.read_csv(pred_path, sep=None, engine="python")
        self.save_name = path.split("/")[-1]
        return self

    def load_pretrained_torch(self, path: str):
        """Import a reference PyTorch checkpoint directory (model.pt +
        config.pkl) — serve reference-trained models from this framework."""
        import pickle

        from .engine.checkpoint import load_pretrained_torch

        with open(os.path.join(path, "config.pkl"), "rb") as f:
            config = pickle.load(f)
        self.initialize_model(**config)
        self.config = config
        self.params = load_pretrained_torch(
            path, config["gnn_num_layers"], config["gnn_backbone"]
        )
        self.best_params = self.params
        return self

    # --------------------------------------------------------------- training

    def _resolve_mesh(self, mesh):
        """mesh: None (single device), an int (data-parallel over that many
        devices), a dict of mesh axis sizes, or a jax.sharding.Mesh."""
        if mesh is None:
            return None
        from jax.sharding import Mesh

        if isinstance(mesh, Mesh):
            return mesh
        from .parallel.mesh import make_mesh

        if isinstance(mesh, int):
            return make_mesh(data=mesh, model=1)
        if isinstance(mesh, dict):
            return make_mesh(data=mesh.get("data", 1),
                             model=mesh.get("model", 1))
        raise TypeError(f"mesh must be None, int, dict or Mesh, got {mesh!r}")

    def _device_state(self, mesh=None):
        import jax
        import jax.numpy as jnp

        cg = self.data.compile()
        streamed = getattr(self, "stream_features", [])
        if streamed:
            from .engine.streamed import strip_streamed_features

            self._x_host = {
                t: cg.node_x[t][: cg.num_nodes[t]] for t in streamed
            }
            stripped = strip_streamed_features(
                cg.arrays(), streamed, cg.padded_nodes
            )
            if (mesh is None
                    and getattr(self.model_cfg, "layout_operands", False)):
                # streamed features + layout operands compose (both are
                # at-scale memory levers); without this the streamed
                # branch would silently fall back to HLO-literal layouts
                from .models.hetero_gnn import build_layout_operands

                stripped["merged_ops"] = build_layout_operands(
                    self.model_cfg, cg.meta())
            if mesh is not None:
                # streamed x mesh composition: the stripped graph shards
                # like any other, h1 rows shard in engine/streamed.py
                from .parallel.shard import shard_graph_arrays

                arrays = shard_graph_arrays(mesh, stripped)
            else:
                arrays = jax.device_put(stripped)
        elif mesh is not None:
            from .parallel.shard import shard_graph_arrays

            self._x_host = {}
            arrays = shard_graph_arrays(mesh, cg.arrays())
        else:
            self._x_host = {}
            arrays_np = cg.arrays()
            if getattr(self.model_cfg, "layout_operands", False):
                # layout index arrays ride the arrays pytree as traced
                # operands instead of HLO literals — required above ~400k
                # SNPs where the serialized literal program breaks remote
                # compile endpoints (models.hetero_gnn.build_layout_operands)
                from .models.hetero_gnn import build_layout_operands

                arrays_np["merged_ops"] = build_layout_operands(
                    self.model_cfg, cg.meta())
            arrays = jax.device_put(arrays_np)

        n_pad = cg.padded_nodes["SNP"]
        y_node = np.zeros(n_pad, dtype=np.float32)
        y_lbl = self.data.graph.node_labels.get("SNP")
        if y_lbl is not None:
            y_node[: len(y_lbl)] = y_lbl

        # LDSC weights are only present after process_gwas_file; inference-only
        # sessions (predict from a checkpoint) don't need them
        w_node = np.zeros(n_pad, dtype=np.float32)
        for rs, w in getattr(self.data, "rs_id_to_ldsc_weight", {}).items():
            w_node[self.data.id2idx["SNP"][rs]] = w

        return cg, arrays, jnp.asarray(y_node), jnp.asarray(w_node)

    def train(
        self,
        batch_size: int = 512,
        num_workers: int = 0,  # API parity; no CPU sampler processes exist
        lr: float = 1e-4,
        weight_decay: float = 5e-4,
        epoch: int = 10,
        save_best_model: bool = True,
        save_name: Optional[str] = None,
        data_to_cuda: bool = False,  # reference API parity; graph always in HBM
        shuffle: bool = False,
        log_interval: int = 500,
        profile_dir: Optional[str] = None,
        metrics_log: Optional[str] = None,
        checkpoint_every: Optional[int] = None,
        resume: bool = False,
        max_restarts: int = 0,
        mesh=None,
        scan_steps: int = 8,
        heartbeat_path: Optional[str] = None,
    ):
        """Training defaults mirror reference kgwas/kgwas.py:85-87.
        scan_steps=S dispatches S optimizer steps per host round-trip via
        one lax.scan (single-device path only; 0/1 disables) — identical
        math to per-step dispatch, removes per-step host latency.
        heartbeat_path: progress-marker file touched every dispatched
        block, for the process-level stall watchdog
        (engine/watchdog.run_with_watchdog — recovers wedged accelerator
        claims that hang without raising).
        profile_dir captures a jax.profiler trace of epoch 1; metrics_log
        appends per-epoch JSONL records (edges/s, epoch time, val metrics).
        checkpoint_every=N saves (params, opt_state) asynchronously via orbax
        every N steps; resume=True restores the latest such state.
        max_restarts=N enables elastic recovery: transient backend
        failures (TPU runtime INTERNAL, relay claim timeouts — see
        engine/resilience.py) restore the last epoch-boundary snapshot,
        re-upload the graph, and continue; fatal errors (OOM, shape bugs)
        still raise. The reference has no failure handling at all.
        mesh: multi-chip training — an int (data-parallel device count), a
        dict of mesh axis sizes ({'data': 8, 'model': 1}), or a
        jax.sharding.Mesh; the step auto-selects the shard_map'd fused
        kernels when the graph layouts divide the mesh
        (parallel/shard._select_kernel_path)."""
        import jax
        import jax.numpy as jnp

        from .engine.profiling import ThroughputMeter, profile_trace
        from .engine.watchdog import touch_heartbeat

        total_epoch = epoch
        if save_name is None:
            save_name = self.exp_name
        self.save_name = save_name

        print_sys("Compiling graph shards...")
        mesh = self._resolve_mesh(mesh)
        self.mesh = mesh
        cg, arrays, y_node, w_node = self._device_state(mesh)
        train_ids = np.asarray(self.data.train_mask)
        val_ids = np.asarray(self.data.val_mask)
        test_ids = np.asarray(self.data.test_mask)

        optimizer = build_optimizer(lr, weight_decay)
        opt_state = optimizer.init(self.params)

        ckpt_dir = os.path.join(self.data_path, "model", save_name, "train_state")
        checkpointer = None
        if checkpoint_every:
            from .engine.checkpoint import make_async_checkpointer

            checkpointer = make_async_checkpointer()
        if resume:
            from .engine.checkpoint import latest_train_state, restore_train_state

            latest = latest_train_state(ckpt_dir)
            if latest:
                print_sys(f"Resuming train state from {latest}")
                self.params, opt_state = restore_train_state(
                    latest, self.params, opt_state
                )

        streamed = getattr(self, "stream_features", [])
        if streamed:
            from .engine.loop import make_forward_streamed
            from .engine.streamed import (
                make_streamed_train_step,
                strip_streamed_features,
            )

            template = None
            if mesh is not None:
                cg_t = self.data.compile()
                template = strip_streamed_features(
                    cg_t.arrays(), streamed, cg_t.padded_nodes
                )
                from .parallel.shard import node_vector_sharding, replicated

                nodes = node_vector_sharding(mesh)
                y_node = jax.device_put(y_node, nodes)
                w_node = jax.device_put(w_node, nodes)
            streamed_step = make_streamed_train_step(
                self.model_cfg, self.meta, optimizer, streamed,
                mesh=mesh, arrays_template=template,
            )
            x_host = self._x_host

            def train_step(params, opt_state, arrays, bidx, y, w):
                return streamed_step(params, opt_state, arrays, x_host, bidx, y, w)

            fwd_streamed = make_forward_streamed(
                self.model_cfg, self.meta, mesh=mesh, arrays_template=template,
                streamed_types=streamed,
            )

            def forward(params, arrays):
                return fwd_streamed(params, arrays, x_host)

        elif mesh is not None:
            from .parallel.shard import (
                make_sharded_forward,
                make_sharded_train_step,
                node_vector_sharding,
                replicated,
            )

            template = self.data.compile().arrays()
            sharded_step = make_sharded_train_step(
                self.model_cfg, self.meta, optimizer, mesh, template
            )
            forward = make_sharded_forward(
                self.model_cfg, self.meta, mesh, template
            )
            rep = replicated(mesh)
            nodes = node_vector_sharding(mesh)
            y_node = jax.device_put(y_node, nodes)
            w_node = jax.device_put(w_node, nodes)

            def train_step(params, opt_state, arrays, bidx, y, w):
                return sharded_step(
                    params, opt_state, arrays, jax.device_put(bidx, rep), y, w
                )

        else:
            train_step = make_train_step(self.model_cfg, self.meta, optimizer)
            forward = make_forward(self.model_cfg, self.meta)
        train_scan = None
        if mesh is None and not streamed and scan_steps and scan_steps > 1:
            from .engine.loop import make_train_scan

            train_scan = make_train_scan(self.model_cfg, self.meta, optimizer)
        self._forward = forward

        params = self.params
        # device copy: train_step donates its input buffers, so the initial
        # pytree must be snapshotted or a never-improving run (e.g. NaN val
        # pearson) would save deleted buffers (mirrors reference kgwas.py:124
        # deepcopy of the initial model)
        best_params = jax.tree_util.tree_map(jnp.copy, params)
        min_val = -1000.0  # early-stop on ascending val pearson (ref :119-123)
        best_epoch = 0
        shuffle_rng = np.random.default_rng(self.seed)

        edges_per_step = cg.total_real_edges() * self.model_cfg.gnn_num_layers
        meter = ThroughputMeter(edges_per_step, log_path=metrics_log)

        print_sys("Start Training...")
        self.train_history = []
        # per-epoch per-STEP loss record (reference logs these to wandb,
        # kgwas.py:147-148; the e2e pipeline-parity oracle compares them
        # step-for-step — tests/test_e2e_reference_pipeline.py)
        self.epoch_losses = []
        self.restart_count = 0
        global_step = 0
        fault_hook = getattr(self, "_fault_hook", None)

        # elastic recovery (max_restarts > 0): host-side snapshots survive a
        # backend restart that invalidates every device buffer. Snapshots are
        # taken at epoch boundaries; a restart replays at most one epoch.
        if max_restarts:
            from .engine.resilience import (RetryPolicy,
                                            is_transient_backend_error,
                                            sleep_backoff)

            policy = RetryPolicy(max_restarts=max_restarts)

            def host_snap(tree):
                return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))

            snap = {
                "params": host_snap(params),
                "opt": host_snap(opt_state),
                "best": host_snap(best_params),
                "min_val": min_val,
                "best_epoch": best_epoch,
                "ep": 0,
                "global_step": 0,
            }

        ep = 0
        while ep < total_epoch:
            try:
                batches = epoch_batches(
                    train_ids, batch_size, shuffle, shuffle_rng
                )
                self.epoch_losses = self.epoch_losses[:ep]
                self.epoch_losses.append([])
                last_loss = float("nan")
                meter.start_epoch()
                with profile_trace(profile_dir if ep == 0 else None):
                    def _after_block(blk_losses, start_step):
                        """Side channels for the steps just dispatched:
                        meter ticks, checkpoint cadence crossings, wandb,
                        log_interval prints, heartbeat. Shared by the
                        scanned and per-step dispatch modes."""
                        nonlocal global_step, last_loss
                        n = len(blk_losses)
                        for _ in range(n):
                            meter.step()
                        g0 = global_step
                        global_step += n
                        if checkpointer and (
                            global_step // checkpoint_every
                            > g0 // checkpoint_every
                        ):
                            from .engine.checkpoint import (
                                save_train_state_async,
                            )

                            save_train_state_async(
                                checkpointer, ckpt_dir, global_step,
                                jax.tree_util.tree_map(jnp.copy, params),
                                jax.tree_util.tree_map(jnp.copy, opt_state),
                            )
                        self.epoch_losses[-1].extend(
                            float(lv) for lv in np.asarray(blk_losses)
                        )
                        if self.wandb:
                            for lv in np.asarray(blk_losses):
                                self.wandb.log(
                                    {"training_loss": float(lv)}
                                )
                        for k in range(n):
                            st = start_step + k
                            if (st % log_interval == 0
                                    and st >= log_interval):
                                print_sys(
                                    f"Epoch {ep + 1} Step {st + 1} "
                                    f"Train Loss: "
                                    f"{float(blk_losses[k]):.4f}"
                                )
                        last_loss = blk_losses[-1]
                        touch_heartbeat(heartbeat_path)

                    # scanned dispatch: S steps per host round-trip; the
                    # trailing partial block runs through the per-step
                    # program (already built — avoids compiling a second
                    # scan shape). Fault hooks fire for every covered
                    # step BEFORE the block dispatches.
                    step0 = 0
                    while step0 < len(batches):
                        remaining = len(batches) - step0
                        n_blk = (scan_steps
                                 if train_scan is not None
                                 and remaining >= scan_steps else 1)
                        blk = batches[step0:step0 + n_blk]
                        if fault_hook is not None:
                            for k in range(len(blk)):
                                fault_hook(global_step + k)
                        if len(blk) > 1:
                            params, opt_state, losses = train_scan(
                                params, opt_state, arrays,
                                jnp.asarray(np.stack(blk)), y_node, w_node,
                            )
                        else:
                            params, opt_state, loss = train_step(
                                params, opt_state, arrays,
                                jnp.asarray(blk[0]), y_node, w_node,
                            )
                            losses = [loss]
                        _after_block(losses, step0)
                        step0 += len(blk)
                    jax.block_until_ready(last_loss)

                # reset the stall clock around the epoch-end full-graph
                # eval: its first-epoch compile produces no step heartbeats
                # (watchdog timeouts must cover this compile + forward)
                touch_heartbeat(heartbeat_path)
                pred_all = np.asarray(forward(params, arrays))
                touch_heartbeat(heartbeat_path)
                # reference quirk mirrored: the val loader is built with the
                # TRAIN kwargs, so drop_last=True silently drops the tail
                # n_val % batch_size SNPs from the early-stop metric
                # (reference kgwas.py:92,104 + utils.py:20-39). Deviation:
                # when n_val < batch_size the reference crashes on
                # np.hstack([]) — we fall back to the full val set instead.
                n_val_eval = (len(val_ids) // batch_size) * batch_size
                val_eval_ids = val_ids[:n_val_eval] if n_val_eval else val_ids
                val_metrics = compute_metrics(
                    {"pred": pred_all[val_eval_ids],
                     "truth": np.asarray(y_node)[val_eval_ids]}
                )
                rec = meter.end_epoch(
                    ep + 1,
                    extra={
                        "loss": float(last_loss),
                        **{f"val_{k}": v for k, v in val_metrics.items()},
                    },
                )
                print_sys(
                    f"Epoch {ep + 1}: Validation MSE: {val_metrics['mse']:.4f} "
                    f"Validation Pearson: {val_metrics['pearsonr']:.4f}. "
                    f"({rec['steps']} steps, {rec['epoch_time_s']:.2f}s, "
                    f"{rec['edges_per_sec']:.3g} edge-traversals/s)"
                )
                self.train_history.append(rec)
                if self.wandb:
                    for k, v in val_metrics.items():
                        self.wandb.log({"val_" + k: v})

                if val_metrics["pearsonr"] > min_val:
                    min_val = val_metrics["pearsonr"]
                    # device copy: train_step donates its input buffers, so a
                    # by-reference snapshot would be invalidated next step
                    best_params = jax.tree_util.tree_map(jnp.copy, params)
                    best_epoch = ep

                ep += 1
                if max_restarts:
                    snap = {
                        "params": host_snap(params),
                        "opt": host_snap(opt_state),
                        "best": host_snap(best_params),
                        "min_val": min_val,
                        "best_epoch": best_epoch,
                        "ep": ep,
                        "global_step": global_step,
                    }
            except Exception as e:  # noqa: BLE001 — classified below
                if not (max_restarts
                        and self.restart_count < max_restarts
                        and is_transient_backend_error(e)):
                    raise
                self.restart_count += 1
                print_sys(
                    f"Transient backend failure ({type(e).__name__}: "
                    f"{str(e)[:200]}); restart "
                    f"{self.restart_count}/{max_restarts} from epoch "
                    f"{snap['ep'] + 1}"
                )
                sleep_backoff(policy, self.restart_count)
                # re-upload everything: a backend restart invalidates all
                # device buffers (graph arrays included)
                cg, arrays, y_node, w_node = self._device_state(mesh)
                if mesh is not None:
                    from .parallel.shard import node_vector_sharding

                    _nodes = node_vector_sharding(mesh)
                    y_node = jax.device_put(y_node, _nodes)
                    w_node = jax.device_put(w_node, _nodes)
                params = jax.tree_util.tree_map(jnp.asarray, snap["params"])
                opt_state = jax.tree_util.tree_map(jnp.asarray, snap["opt"])
                best_params = jax.tree_util.tree_map(jnp.asarray, snap["best"])
                min_val = snap["min_val"]
                best_epoch = snap["best_epoch"]
                ep = snap["ep"]
                global_step = snap["global_step"]
                self.train_history = self.train_history[:ep]

        self.params = params
        self.best_params = best_params
        self.best_epoch = best_epoch
        if checkpointer:
            checkpointer.wait_until_finished()

        if save_best_model:
            save_model_path = os.path.join(self.data_path, "model")
            print_sys("Saving models to " + os.path.join(save_model_path, save_name))
            save_model(
                best_params, self.config, os.path.join(save_model_path, save_name)
            )

        # test + infer with the best model (reference kgwas.py:182-191)
        pred_all = np.asarray(forward(best_params, arrays))
        test_metrics = compute_metrics(
            {"pred": pred_all[test_ids], "truth": np.asarray(y_node)[test_ids]}
        )
        self.test_metrics = test_metrics
        if self.wandb:
            for k, v in test_metrics.items():
                self.wandb.log({"test_" + k: v})

        # SR reweighting + calibration tail (reference kgwas.py:186-212),
        # extracted to stats.calibration.finalize_predictions so the
        # chaining is oracle-testable on identical inputs
        infer_idx = np.asarray(self.data.all_mask)
        lr_uni_to_save, scale_factor = finalize_predictions(
            self.data.lr_uni, pred_all[infer_idx]
        )
        self.scale_factor = scale_factor

        out_dir = os.path.join(self.data_path, "model_pred", "new_experiments")
        os.makedirs(out_dir, exist_ok=True)
        out_csv = os.path.join(out_dir, save_name + "_pred.csv")
        lr_uni_to_save.to_csv(out_csv, index=False, sep="\t")
        print_sys("KGWAS prediction and p-values saved to " + out_csv)
        if save_best_model:
            lr_uni_to_save.to_csv(
                os.path.join(self.data_path, "model", save_name, "pred.csv"),
                index=False,
                sep="\t",
            )
        self.kgwas_res = lr_uni_to_save
        return lr_uni_to_save

    # -------------------------------------------------------------- inference

    def predict_all(self, params=None) -> np.ndarray:
        """Per-SNP predictions for every KG SNP (one full-graph forward)."""
        cg, arrays, _, _ = self._device_state()
        forward = getattr(self, "_forward", None)
        if forward is None:
            if getattr(self, "stream_features", []):
                from .engine.loop import make_forward_streamed

                fwd_s = make_forward_streamed(self.model_cfg, self.meta)
                forward = lambda p, a: fwd_s(p, a, self._x_host)  # noqa: E731
            else:
                forward = make_forward(self.model_cfg, self.meta)
        pred = np.asarray(forward(params or self.best_params, arrays))
        return pred[: cg.num_nodes["SNP"]]

    # ------------------------------------------------------------------ magma

    def run_magma(self, path_to_magma: str, bfile: str):
        from .external.magma import run_magma

        return run_magma(self, path_to_magma, bfile)

    # --------------------------------------------------------- interpretation

    def get_disease_critical_network(
        self,
        variant_threshold: float = 5e-8,
        magma_path: Optional[str] = None,
        magma_threshold: float = 0.05,
        program_threshold: float = 0.05,
        K_neighbors: int = 3,
        num_cpus: int = 1,
    ):
        from .interpret.attention import get_network_weight
        from .interpret.network import generate_viz

        df_network_weight = get_network_weight(self, self.data)
        df_variant_interpretation, disease_critical_network = generate_viz(
            self,
            df_network_weight,
            self.data_path,
            variant_threshold,
            magma_path,
            magma_threshold,
            program_threshold,
            K_neighbors,
            num_cpus,
        )
        return df_network_weight, df_variant_interpretation, disease_critical_network
