"""Checkpointing: config + weights + predictions (same artifact contract as
the reference: config.pkl / model weights / pred.csv — reference
kgwas/utils.py:203-225, kgwas/kgwas.py:73-83,176-179,208-211), plus an
importer for reference PyTorch checkpoints so pretrained reference models can
be served from this framework directly.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict

import numpy as np

SEP = "/"


def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, f"{prefix}{k}{SEP}"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(flatten_params(v, f"{prefix}{i}{SEP}"))
    else:
        out[prefix[: -len(SEP)]] = np.asarray(params)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return _listify(root)


def _listify(node):
    """Convert dicts whose keys are 0..n-1 ints back into lists."""
    if not isinstance(node, dict):
        return node
    node = {k: _listify(v) for k, v in node.items()}
    keys = list(node.keys())
    if keys and all(k.isdigit() for k in keys):
        idx = sorted(int(k) for k in keys)
        if idx == list(range(len(idx))):
            return [node[str(i)] for i in idx]
    return node


def save_model(params, config: dict, path_dir: str):
    """config.pkl keys mirror the reference's model config dict
    (reference kgwas/kgwas.py:54-60)."""
    os.makedirs(path_dir, exist_ok=True)
    flat = flatten_params(params)
    np.savez(os.path.join(path_dir, "model.npz"), **flat)
    with open(os.path.join(path_dir, "config.pkl"), "wb") as f:
        pickle.dump(config, f, pickle.HIGHEST_PROTOCOL)


def load_model(path_dir: str):
    with open(os.path.join(path_dir, "config.pkl"), "rb") as f:
        config = pickle.load(f)
    with np.load(os.path.join(path_dir, "model.npz")) as z:
        flat = {k: z[k] for k in z.files}
    return unflatten_params(flat), config


# ---------------------------------------------------------------------------
# Orbax async checkpointing (restartable long runs; the reference's only
# resume story is "rerun from scratch" — SURVEY.md section 5)
# ---------------------------------------------------------------------------

def make_async_checkpointer():
    import orbax.checkpoint as ocp

    return ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())


def save_train_state_async(checkpointer, path_dir: str, step: int, params,
                           opt_state):
    """Non-blocking save of (params, opt_state) for mid-training restart.
    Call checkpointer.wait_until_finished() before process exit."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(path_dir), f"step_{step}")
    checkpointer.save(
        path, args=ocp.args.StandardSave({"params": params,
                                          "opt_state": opt_state}),
        force=True,
    )
    return path


def restore_train_state(path: str, params_template=None, opt_state_template=None):
    """Restore (params, opt_state). Pass templates to recover the exact pytree
    structure (optax states are NamedTuples that orbax can't reconstruct from
    the serialized tree alone)."""
    import jax
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    if params_template is not None and opt_state_template is not None:
        template = jax.tree_util.tree_map(
            np.asarray, {"params": params_template,
                         "opt_state": opt_state_template}
        )
        out = ckpt.restore(os.path.abspath(path), template)
    else:
        out = ckpt.restore(os.path.abspath(path))
    return out["params"], out["opt_state"]


def latest_train_state(path_dir: str):
    if not os.path.isdir(path_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(path_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    if not steps:
        return None
    return os.path.join(path_dir, f"step_{max(steps)}")


# ---------------------------------------------------------------------------
# Reference (PyTorch) checkpoint import
# ---------------------------------------------------------------------------

_MLP_MAP = {"FC_hidden": "fc1", "FC_hidden2": "fc2", "FC_output": "fc3"}


def import_torch_state_dict(state_dict, num_layers: int, backbone: str = "GAT"):
    """Map a reference ``model.pt`` state_dict (reference kgwas/model.py
    module tree) onto this framework's parameter pytree.

    Handles: DataParallel 'module.' prefixes (reference utils.py:210-219),
    torch's [out, in] -> our [in, out] weight transpose, PyG HeteroConv
    ModuleDict keys ('src__rel__dst' — same key format we use), and GAT att
    tensors [1, H, C] -> [H, C].
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[7:]
        # copy=True: torch .numpy() returns a VIEW of the tensor storage, and
        # jax's CPU backend can zero-copy numpy arrays — without the copy,
        # later in-place mutation of the torch module (e.g. optimizer steps)
        # would silently corrupt the imported parameters
        sd[k] = np.array(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                         copy=True)

    params: dict = {"convs": [dict() for _ in range(num_layers)], "lin": {}}

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("snp_feat_mlp", "go_feat_mlp", "gene_feat_mlp"):
            mlp = params.setdefault(parts[0], {})
            layer = _MLP_MAP[parts[1]]
            dest = mlp.setdefault(layer, {})
            if parts[2] == "weight":
                dest["w"] = val.T
            else:
                dest["b"] = val
        elif parts[0] == "convs":
            li = int(parts[1])
            # reference path: convs.{L}.convs.{src__rel__dst}.{param...}
            assert parts[2] == "convs", key
            relkey = parts[3]
            rp = params["convs"][li].setdefault(relkey, {})
            tail = parts[4:]
            if tail[0] in ("lin_src", "lin_dst", "lin_l", "lin_r", "lin"):
                dest = rp.setdefault(tail[0], {})
                if tail[1] == "weight":
                    dest["w"] = val.T
                else:
                    dest["b"] = val
            elif tail[0] in ("att_src", "att_dst", "att_edge"):
                rp[tail[0]] = val.reshape(val.shape[-2], val.shape[-1])
            elif tail[0] == "bias":
                rp["bias"] = val
            else:
                raise KeyError(f"unmapped conv param {key}")
        elif parts[0] == "lin":
            if parts[1] == "weight":
                params["lin"]["w"] = val.T
            else:
                params["lin"]["b"] = val
        else:
            raise KeyError(f"unmapped param {key}")
    return params


def load_pretrained_torch(path: str, num_layers: int, backbone: str = "GAT"):
    """Load a reference-format checkpoint directory (model.pt + config.pkl)."""
    import torch

    state_dict = torch.load(
        os.path.join(path, "model.pt"), map_location="cpu", weights_only=True
    )
    return import_torch_state_dict(state_dict, num_layers, backbone)
