"""Self-describing checkpoints.

Same contract as the reference (ref distillation/nnunetv2/training/nnUNetTrainer/
nnUNetTrainer.py:1149-1172): a checkpoint plus the plans.json/dataset.json copied
into the results folder is sufficient to rebuild the network for inference —
`trainer_name` + `init_args` drive reconstruction (predict_from_raw_data.py:89-104).

Format: a single pickle holding numpy-ified pytrees (flax state dicts). Params
are framework-agnostic nested dicts of numpy arrays — no torch, no orbax
dependency, loadable from the C++ engine via np.load-able sidecars if needed.
"""
import pickle
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(fname: str, *, network_weights, optimizer_state=None,
                    current_epoch: int = 0, logging: Optional[dict] = None,
                    best_ema: Optional[float] = None, init_args: Optional[dict] = None,
                    trainer_name: str = "NNUNetTrainer",
                    inference_allowed_mirroring_axes=None,
                    grad_scaler_state=None, extras: Optional[dict] = None) -> None:
    ckpt = {
        "network_weights": serialization.to_state_dict(_to_numpy_tree(network_weights)),
        "optimizer_state": serialization.to_state_dict(_to_numpy_tree(optimizer_state))
        if optimizer_state is not None else None,
        "grad_scaler_state": grad_scaler_state,  # kept for contract parity (always None)
        "current_epoch": current_epoch,
        "logging": logging,
        "_best_ema": best_ema,
        "init_args": init_args,
        "trainer_name": trainer_name,
        "inference_allowed_mirroring_axes": inference_allowed_mirroring_axes,
    }
    if extras:
        ckpt.update(extras)
    with open(fname, "wb") as f:
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(fname: str) -> dict:
    with open(fname, "rb") as f:
        return pickle.load(f)


def restore_params(template_params, state_dict) -> Any:
    """Rebuild a params pytree (matching template structure) from a checkpoint's
    network_weights state dict."""
    return serialization.from_state_dict(template_params, state_dict)


def restore_params_partial(template_params, state_dict) -> tuple:
    """Tolerant restore for distillation continue-training: copies every leaf
    whose path exists and shape matches; returns (params, n_loaded, n_total)
    (ref nnUNetDistillationTrainer.load_student_checkpoint:1063-1143)."""
    flat_template = _flatten("", serialization.to_state_dict(
        jax.tree_util.tree_map(np.asarray, template_params)))
    flat_ckpt = _flatten("", state_dict)
    merged = dict(flat_template)
    n_loaded = 0
    for k, v in flat_ckpt.items():
        if k in merged and np.shape(merged[k]) == np.shape(v):
            merged[k] = v
            n_loaded += 1
    rebuilt = _unflatten(merged)
    return (serialization.from_state_dict(template_params, rebuilt),
            n_loaded, len(flat_template))


def _flatten(prefix: str, tree: dict) -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(key, v))
        else:
            out[key] = v
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out
