"""Import torch checkpoints (ImageNet ResNet-50, reference vpho_net dumps).

The reference initializes its dual-stream backbone from torchvision's
ImageNet resnet50 (backbone_FPN_HFL.py:256-261).  With zero egress we cannot
download it at runtime, but when a local ``resnet50.pth`` state_dict is
provided (asset/resnet50.pth by convention) this module maps it into the
Flax parameter tree of ``FPNBackbone`` — both streams share layer0/1/4 per
the reference, and layer2/3 are initialized from the same torch weights for
the hand and object branches.

Layout mapping:
  torch conv weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)
  torch bn {weight, bias, running_mean, running_var} ->
      flax params {scale, bias} + batch_stats {mean, var}
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node[k]
    assert node[path[-1]].shape == value.shape, (
        f"{path}: {node[path[-1]].shape} vs {value.shape}")
    node[path[-1]] = value


def _copy_bottleneck(params, stats, prefix_flax, sd, prefix_torch, has_down):
    """Copy one torch Bottleneck into a flax Bottleneck scope."""
    convs = [("conv1", "Conv_0"), ("conv2", "Conv_1"), ("conv3", "Conv_2")]
    bns = [("bn1", "TorchBatchNorm_0"), ("bn2", "TorchBatchNorm_1"), ("bn3", "TorchBatchNorm_2")]
    for (tname, fname) in convs:
        _set(params, prefix_flax + (fname, "kernel"), _conv(sd[f"{prefix_torch}.{tname}.weight"]))
    for (tname, fname) in bns:
        _set(params, prefix_flax + (fname, "BatchNorm_0", "scale"),
             np.asarray(sd[f"{prefix_torch}.{tname}.weight"]))
        _set(params, prefix_flax + (fname, "BatchNorm_0", "bias"),
             np.asarray(sd[f"{prefix_torch}.{tname}.bias"]))
        _set(stats, prefix_flax + (fname, "BatchNorm_0", "mean"),
             np.asarray(sd[f"{prefix_torch}.{tname}.running_mean"]))
        _set(stats, prefix_flax + (fname, "BatchNorm_0", "var"),
             np.asarray(sd[f"{prefix_torch}.{tname}.running_var"]))
    if has_down:
        _set(params, prefix_flax + ("Conv_3", "kernel"),
             _conv(sd[f"{prefix_torch}.downsample.0.weight"]))
        _set(params, prefix_flax + ("TorchBatchNorm_3", "BatchNorm_0", "scale"),
             np.asarray(sd[f"{prefix_torch}.downsample.1.weight"]))
        _set(params, prefix_flax + ("TorchBatchNorm_3", "BatchNorm_0", "bias"),
             np.asarray(sd[f"{prefix_torch}.downsample.1.bias"]))
        _set(stats, prefix_flax + ("TorchBatchNorm_3", "BatchNorm_0", "mean"),
             np.asarray(sd[f"{prefix_torch}.downsample.1.running_mean"]))
        _set(stats, prefix_flax + ("TorchBatchNorm_3", "BatchNorm_0", "var"),
             np.asarray(sd[f"{prefix_torch}.downsample.1.running_var"]))


def load_resnet50_into_backbone(variables: Dict[str, Any], state_dict) -> Dict[str, Any]:
    """Map a torchvision resnet50 state_dict into FPNBackbone variables.

    variables: full model variables (params/batch_stats) whose params contain
    ``feature_extractor``.  Returns a new variables dict (deep-copied trees).
    """
    import jax

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    fe_p = params["feature_extractor"]
    fe_s = stats["feature_extractor"]
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    # stem
    _set(fe_p, ("stem", "Conv_0", "kernel"), _conv(sd["conv1.weight"]))
    _set(fe_p, ("stem", "TorchBatchNorm_0", "BatchNorm_0", "scale"), sd["bn1.weight"])
    _set(fe_p, ("stem", "TorchBatchNorm_0", "BatchNorm_0", "bias"), sd["bn1.bias"])
    _set(fe_s, ("stem", "TorchBatchNorm_0", "BatchNorm_0", "mean"), sd["bn1.running_mean"])
    _set(fe_s, ("stem", "TorchBatchNorm_0", "BatchNorm_0", "var"), sd["bn1.running_var"])

    layer_blocks = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}
    flax_names = {
        "layer1": ["layer1"], "layer4": ["layer4"],
        "layer2": ["layer2_h", "layer2_o"], "layer3": ["layer3_h", "layer3_o"],
    }
    for tlayer, nblocks in layer_blocks.items():
        for fname in flax_names[tlayer]:
            for b in range(nblocks):
                _copy_bottleneck(
                    fe_p, fe_s, (fname, f"Bottleneck_{b}"), sd,
                    f"{tlayer}.{b}", has_down=(b == 0))

    new_vars = dict(variables)
    new_vars["params"] = params
    new_vars["batch_stats"] = stats
    return new_vars


def load_torch_file(path: str):
    """Load a .pth state_dict with torch (CPU) if available."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}
