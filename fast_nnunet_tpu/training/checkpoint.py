"""Self-describing checkpoints.

Same contract as the reference (ref distillation/nnunetv2/training/nnUNetTrainer/
nnUNetTrainer.py:1149-1172): a checkpoint plus the plans.json/dataset.json copied
into the results folder is sufficient to rebuild the network for inference —
`trainer_name` + `init_args` drive reconstruction (predict_from_raw_data.py:89-104).

Two storage backends behind one save/load API:

- default: a single pickle holding numpy-ified pytrees (flax state dicts).
  Framework-agnostic nested dicts of numpy arrays — no torch, no orbax
  dependency, loadable from the C++ engine via np.load-able sidecars.
- ``backend="orbax"`` (or FNN_CKPT_BACKEND=orbax): the weight/optimizer
  pytrees go through orbax-checkpoint instead. On a multi-host mesh every
  host writes only its addressable shards (no device_get gather through one
  host), which is the TPU-pod answer to torch.save on rank 0. The checkpoint
  becomes a directory; small metadata stays in a pickle inside it.
  load_checkpoint dispatches on path type, so resume and inference work with
  either format transparently.
"""
import os
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
                    grad_scaler_state=None, extras: Optional[dict] = None,
                    backend: Optional[str] = None) -> None:
    backend = backend or os.environ.get("FNN_CKPT_BACKEND", "pickle")
    if backend == "orbax":
        return _save_checkpoint_orbax(
            fname, network_weights=network_weights,
            optimizer_state=optimizer_state, current_epoch=current_epoch,
            logging=logging, best_ema=best_ema, init_args=init_args,
            trainer_name=trainer_name,
            inference_allowed_mirroring_axes=inference_allowed_mirroring_axes,
            extras=extras)
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


_ARRAY_MARKER = "__fnnx_array__"
_EMPTY_MARKER = "__fnnx_empty__"


def _flatten_keep_empty(prefix: str, tree: dict) -> dict:
    """Like _flatten but records empty dict nodes (optax EmptyState etc.) so
    the skeleton reconstructs the exact pytree arity."""
    if not tree:
        return {prefix: _EMPTY_MARKER} if prefix else {}
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_keep_empty(key, v))
        else:
            out[key] = v
    return out


def _save_checkpoint_orbax(fname: str, *, network_weights, optimizer_state,
                           extras: Optional[dict], **meta) -> None:
    """fname becomes a directory: array leaves go through orbax (each host
    writes its own shards — pass live sharded jax.Arrays, NOT device_get
    copies); the pytree skeleton (incl. namedtuple/empty optax nodes orbax
    would mangle) plus small metadata land in meta.pkl on rank 0."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(fname)
    sd = {"network_weights": serialization.to_state_dict(network_weights)}
    if optimizer_state is not None:
        sd["optimizer_state"] = serialization.to_state_dict(optimizer_state)
    flat = _flatten_keep_empty("", sd)
    arrays = {k.replace("/", "|"): v for k, v in flat.items()
              if hasattr(v, "shape")}
    skeleton = {k: (_ARRAY_MARKER if k.replace("/", "|") in arrays else v)
                for k, v in flat.items()}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), arrays, force=True)
    if jax.process_index() == 0:
        md = dict(meta)
        md["grad_scaler_state"] = None
        if extras:
            md.update(extras)
        md["_best_ema"] = md.pop("best_ema", None)
        md["_skeleton"] = skeleton
        md["_has_optimizer_state"] = optimizer_state is not None
        with open(os.path.join(path, "meta.pkl"), "wb") as f:
            pickle.dump(md, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(fname: str) -> dict:
    if os.path.isdir(fname):  # orbax-backed directory checkpoint
        import orbax.checkpoint as ocp
        with open(os.path.join(fname, "meta.pkl"), "rb") as f:
            ckpt = pickle.load(f)
        skeleton = ckpt.pop("_skeleton")
        with ocp.StandardCheckpointer() as ckptr:
            arrays = ckptr.restore(
                os.path.join(os.path.abspath(fname), "state"))
        merged = {k: (arrays[k.replace("/", "|")]
                      if isinstance(v, str) and v == _ARRAY_MARKER else v)
                  for k, v in skeleton.items()}
        sd = _unflatten_with_empty(merged)
        ckpt["network_weights"] = sd["network_weights"]
        ckpt["optimizer_state"] = sd.get("optimizer_state") \
            if ckpt.pop("_has_optimizer_state", False) else None
        return ckpt
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


def _unflatten_with_empty(flat: dict) -> dict:
    """Inverse of _flatten_keep_empty: empty-marker leaves become {}."""
    nested = _unflatten(flat)

    def fix(node):
        if isinstance(node, str) and node == _EMPTY_MARKER:
            return {}
        if isinstance(node, dict):
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(nested)


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out
