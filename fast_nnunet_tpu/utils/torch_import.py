"""Import reference torch checkpoints into fast_nnunet_tpu parameter trees.

The reference stores torch ``state_dict``s under ``checkpoint['network_weights']``
with dynamic-network-architectures module naming, and its pretraining loader
matches entries by key + shape while skipping ``.seg_layers.`` (ref
distillation/nnunetv2/run/load_pretrained_weights.py:7-69). This module
translates those state dicts into our flax trees so reference-trained models
run on TPU unchanged:

- names:   ``encoder.stages.{s}.convs.{b}.conv`` -> ``encoder/stage_{s}/block_{b}/conv``,
  ``decoder.transpconvs.{s}`` -> ``decoder/transpconv_{s}``,
  ``decoder.seg_layers.{s}`` -> ``decoder/seg_head_{s}``, residual
  ``encoder.stages.{s}.blocks.{b}.conv{1,2}`` -> ``encoder/stage_{s}_block_{b}``
- layouts: torch conv ``(O, I, *k)`` -> flax ``(*k, I, O)``; torch
  ``ConvTranspose3d`` ``(I, O, *k)`` -> flax ``ConvTranspose`` ``(*k, I, O)``
  with all spatial axes flipped (flax's conv_transpose correlates with the
  un-flipped kernel; verified numerically against torch in
  tests/test_torch_import.py); InstanceNorm ``weight`` -> ``scale``.
"""
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = ["translate_torch_key", "torch_tensor_to_jax",
           "import_torch_weights", "load_torch_network_weights"]

# (regex, path builder). Paths are tuples under the 'params' root.
_PATTERNS = [
    # plain encoder/decoder conv blocks; tolerate an extra Sequential index
    # (pooling variants wrap StackedConvBlocks in nn.Sequential)
    (re.compile(r"^(encoder|decoder)\.stages\.(\d+)\.(?:\d+\.)?convs\.(\d+)\."
                r"(conv|norm)\.(weight|bias)$"),
     lambda m: (m.group(1), f"stage_{m.group(2)}", f"block_{m.group(3)}",
                m.group(4), _wb(m.group(4), m.group(5)))),
    # residual encoder stem (StackedConvBlocks with a single conv)
    (re.compile(r"^encoder\.stem\.convs\.0\.(conv|norm)\.(weight|bias)$"),
     lambda m: ("encoder", "stem", m.group(1), _wb(m.group(1), m.group(2)))),
    # residual blocks: conv1/conv2 are ConvDropoutNormReLU submodules
    (re.compile(r"^encoder\.stages\.(\d+)\.(?:\d+\.)?blocks\.(\d+)\."
                r"conv(\d)\.(conv|norm)\.(weight|bias)$"),
     lambda m: ("encoder", f"stage_{m.group(1)}_block_{m.group(2)}",
                f"{m.group(4)}{m.group(3)}", _wb(m.group(4), m.group(5)))),
    # residual blocks: conv1/conv2 as raw Conv3d + norm1/norm2 (alt layout)
    (re.compile(r"^encoder\.stages\.(\d+)\.(?:\d+\.)?blocks\.(\d+)\."
                r"(conv|norm)(\d)\.(weight|bias)$"),
     lambda m: ("encoder", f"stage_{m.group(1)}_block_{m.group(2)}",
                f"{m.group(3)}{m.group(4)}", _wb(m.group(3), m.group(5)))),
    # residual skip projection: Sequential(conv 1x1, norm)
    (re.compile(r"^encoder\.stages\.(\d+)\.(?:\d+\.)?blocks\.(\d+)\."
                r"(?:skip|downsample_skip)\.(\d)\.(weight|bias)$"),
     lambda m: ("encoder", f"stage_{m.group(1)}_block_{m.group(2)}",
                "skip_conv" if m.group(3) == "0" else "skip_norm",
                _wb("conv" if m.group(3) == "0" else "norm", m.group(4)))),
    # decoder transposed convolutions
    (re.compile(r"^decoder\.transpconvs\.(\d+)\.(weight|bias)$"),
     lambda m: ("decoder", f"transpconv_{m.group(1)}",
                "kernel" if m.group(2) == "weight" else "bias")),
    # segmentation heads (1x1x1 convs)
    (re.compile(r"^decoder\.seg_layers\.(\d+)\.(weight|bias)$"),
     lambda m: ("decoder", f"seg_head_{m.group(1)}",
                "kernel" if m.group(2) == "weight" else "bias")),
]


def _wb(module: str, leaf: str) -> str:
    """torch leaf name -> flax leaf name for a conv or norm submodule."""
    if module == "conv":
        return "kernel" if leaf == "weight" else "bias"
    return "scale" if leaf == "weight" else "bias"  # InstanceNorm affine


def translate_torch_key(key: str) -> Optional[Tuple[str, ...]]:
    """dnA state_dict key -> path tuple in our params tree (None if unknown).
    DDP ('module.') and torch.compile ('_orig_mod.') prefixes are stripped,
    mirroring the reference's loader notes (load_pretrained_weights.py:13-16)."""
    for prefix in ("module.", "_orig_mod."):
        if key.startswith(prefix):
            key = key[len(prefix):]
    for pat, build in _PATTERNS:
        m = pat.match(key)
        if m:
            return build(m)
    return None


def torch_tensor_to_jax(path: Tuple[str, ...], t) -> np.ndarray:
    """Convert a torch tensor (or ndarray) to our layout for the given path."""
    a = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    leaf = path[-1]
    if leaf == "kernel" and a.ndim >= 3:
        spatial = tuple(range(2, a.ndim))
        if path[-2].startswith("transpconv"):
            # torch ConvTranspose (I, O, *k) -> flax (*k, I, O), spatially
            # flipped (flax conv_transpose correlates with the raw kernel)
            a = np.transpose(a, spatial + (0, 1))
            a = a[tuple(slice(None, None, -1) for _ in spatial)]
        else:
            # torch Conv (O, I, *k) -> flax (*k, I, O); both are correlations
            a = np.transpose(a, spatial + (1, 0))
    return np.ascontiguousarray(a)


def load_torch_network_weights(fname: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint and return its network_weights dict
    (accepts both full trainer checkpoints and bare state_dicts)."""
    import torch
    ckpt = torch.load(fname, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "network_weights" in ckpt:
        return ckpt["network_weights"]
    return ckpt


def import_torch_weights(template_params, state_dict,
                         skip_seg_layers: bool = False):
    """Merge a torch state_dict into a copy of ``template_params``.

    Returns ``(params, report)`` where report lists converted / skipped /
    unmatched keys and shape mismatches. Matching is by translated name AND
    shape, like the reference's pretraining loader; ``skip_seg_layers=True``
    reproduces its '.seg_layers.' exclusion for transfer learning."""
    from flax import serialization
    import jax

    tpl = serialization.to_state_dict(
        jax.tree_util.tree_map(np.asarray, template_params))
    report = {"converted": [], "skipped_seg": [], "unmatched": [],
              "shape_mismatch": [], "missing_in_template": []}

    for key, tensor in state_dict.items():
        if skip_seg_layers and ".seg_layers." in key:
            report["skipped_seg"].append(key)
            continue
        path = translate_torch_key(key)
        if path is None:
            if key.endswith("num_batches_tracked") or ".running_" in key:
                continue  # norm running stats: instance norm keeps none
            report["unmatched"].append(key)
            continue
        node = tpl.get("params", tpl)
        for p in path[:-1]:
            node = node.get(p) if isinstance(node, dict) else None
            if node is None:
                break
        if not isinstance(node, dict) or path[-1] not in node:
            report["missing_in_template"].append(key)
            continue
        arr = torch_tensor_to_jax(path, tensor)
        if np.shape(node[path[-1]]) != arr.shape:
            report["shape_mismatch"].append(
                (key, arr.shape, np.shape(node[path[-1]])))
            continue
        node[path[-1]] = arr.astype(np.asarray(node[path[-1]]).dtype)
        report["converted"].append(key)

    params = serialization.from_state_dict(template_params, tpl)
    return params, report
