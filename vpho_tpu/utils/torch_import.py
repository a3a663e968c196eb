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


# ---------------------------------------------------------------------------
# full vpho_net state_dict import (reference checkpoints -> Flax variables)
# ---------------------------------------------------------------------------


def _linear_t(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.transpose(np.asarray(w), (1, 0))


def _deconv(w) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, in, out), spatially flipped (flax's conv_transpose applies
    the kernel unflipped; torch's is the exact adjoint of a forward conv)."""
    w = np.transpose(np.asarray(w), (2, 3, 0, 1))
    return w[::-1, ::-1]


class _Importer:
    """Tracks consumed torch keys and writes into flax params/stats/buffers."""

    def __init__(self, variables, state_dict):
        import jax

        self.params = jax.tree.map(np.asarray, variables["params"])
        self.stats = jax.tree.map(np.asarray, variables["batch_stats"])
        self.buffers = jax.tree.map(np.asarray, variables["buffers"])
        self.sd = {k: np.asarray(v) for k, v in state_dict.items()}
        self.used: set = set()

    def t(self, key):
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    def conv(self, tkey, *fpath):
        _set(self.params, fpath + ("kernel",), _conv(self.t(tkey + ".weight")))
        if tkey + ".bias" in self.sd:
            _set(self.params, fpath + ("bias",), self.t(tkey + ".bias"))

    def deconv(self, tkey, *fpath):
        _set(self.params, fpath + ("kernel",), _deconv(self.t(tkey + ".weight")))

    def linear(self, tkey, *fpath):
        _set(self.params, fpath + ("kernel",), _linear_t(self.t(tkey + ".weight")))
        _set(self.params, fpath + ("bias",), self.t(tkey + ".bias"))

    def bn(self, tkey, *fpath):
        base = fpath + ("BatchNorm_0",)
        _set(self.params, base + ("scale",), self.t(tkey + ".weight"))
        _set(self.params, base + ("bias",), self.t(tkey + ".bias"))
        _set(self.stats, base + ("mean",), self.t(tkey + ".running_mean"))
        _set(self.stats, base + ("var",), self.t(tkey + ".running_var"))
        self.used.add(tkey + ".num_batches_tracked")

    def residual(self, tkey, *fpath):
        """encoding.py Residual: bn/conv1/bn1/conv2/bn2/conv3 ->
        TorchBatchNorm_0/Conv_0/TorchBatchNorm_1/Conv_1/TorchBatchNorm_2/Conv_2."""
        self.bn(tkey + ".bn", *fpath, "TorchBatchNorm_0")
        self.conv(tkey + ".conv1", *fpath, "Conv_0")
        self.bn(tkey + ".bn1", *fpath, "TorchBatchNorm_1")
        self.conv(tkey + ".conv2", *fpath, "Conv_1")
        self.bn(tkey + ".bn2", *fpath, "TorchBatchNorm_2")
        self.conv(tkey + ".conv3", *fpath, "Conv_2")
        if tkey + ".conv4.weight" in self.sd:
            self.conv(tkey + ".conv4", *fpath, "Conv_3")

    def bottleneck(self, tkey, *fpath):
        """torchvision Bottleneck -> flax Bottleneck scope (see _copy_bottleneck)."""
        for i, name in enumerate(["conv1", "conv2", "conv3"]):
            self.conv(tkey + f".{name}", *fpath, f"Conv_{i}")
            self.bn(tkey + f".bn{i+1}", *fpath, f"TorchBatchNorm_{i}")
        if tkey + ".downsample.0.weight" in self.sd:
            self.conv(tkey + ".downsample.0", *fpath, "Conv_3")
            self.bn(tkey + ".downsample.1", *fpath, "TorchBatchNorm_3")

    def mha(self, tkey, *fpath):
        """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention.

        in_proj packs [q; k; v] as (3*d, d); flax splits each into
        (d, heads, head_dim) kernels computed as x @ kernel."""
        d = self.t(tkey + ".in_proj_weight").shape[1]
        w = self.t(tkey + ".in_proj_weight")
        b = self.t(tkey + ".in_proj_bias")
        # heads from the flax tree shape
        node = self.params
        for k in fpath + ("query", "kernel"):
            node = node[k]
        heads, head_dim = node.shape[1], node.shape[2]
        for i, name in enumerate(["query", "key", "value"]):
            wi = w[i * d:(i + 1) * d].T.reshape(d, heads, head_dim)
            bi = b[i * d:(i + 1) * d].reshape(heads, head_dim)
            _set(self.params, fpath + (name, "kernel"), wi)
            _set(self.params, fpath + (name, "bias"), bi)
        wo = self.t(tkey + ".out_proj.weight").T.reshape(heads, head_dim, d)
        _set(self.params, fpath + ("out", "kernel"), wo)
        _set(self.params, fpath + ("out", "bias"), self.t(tkey + ".out_proj.bias"))

    def layernorm(self, tkey, *fpath):
        _set(self.params, fpath + ("scale",), self.t(tkey + ".weight"))
        _set(self.params, fpath + ("bias",), self.t(tkey + ".bias"))


def _walk_vpho(do, mark_const):
    """The single source of truth for the torch-key <-> Flax-path mapping.

    ``do(kind, tkey, *fpath)`` is invoked once per mapped module, where
    ``kind`` names a visitor method (conv/bn/linear/deconv/residual/
    bottleneck/mha/layernorm/fourier/bank); ``mark_const(key)`` flags torch
    keys that are constants rebuilt from assets on our side (mesh buffers,
    MANO tables, positional tables, anchor dirs).  Driven by both the
    importer (torch -> Flax) and the exporter (Flax -> torch) so the two
    directions can never drift apart.
    """
    # -- feature_extractor (FPN, backbone_FPN_HFL.py:20-109) -------------
    fe = "feature_extractor"
    do("conv", f"{fe}.layer0_h.0", fe, "stem", "Conv_0")
    do("bn", f"{fe}.layer0_h.1", fe, "stem", "TorchBatchNorm_0")
    layer_map = {  # (torch name, flax name, num bottlenecks)
        "layer1_h.0": ("layer1", 3), "layer2_h.0": ("layer2_h", 4),
        "layer2_o.0": ("layer2_o", 4), "layer3_h.0": ("layer3_h", 6),
        "layer3_o.0": ("layer3_o", 6), "layer4_h.0": ("layer4", 3),
    }
    for tname, (fname, nb) in layer_map.items():
        for b in range(nb):
            do("bottleneck", f"{fe}.{tname}.{b}", fe, fname, f"Bottleneck_{b}")
    for nm in ["toplayer_h", "toplayer_o", "latlayer1_h", "latlayer2_h",
               "latlayer3_h", "latlayer1_o", "latlayer2_o", "latlayer3_o",
               "smooth3_h", "smooth3_o"]:
        do("conv", f"{fe}.{nm}", fe, nm)

    # -- heatmap heads (HeadHeatmap2, head_inplane.py:42-113) ------------
    for side in ["hand", "obj"]:
        t = f"head_hm_{side}"
        do("conv", f"{t}.conv_layers.0", t, "Conv_0")
        do("conv", f"{t}.conv_layers.1", t, "Conv_1")
        do("bn", f"{t}.conv_layers.2", t, "TorchBatchNorm_0")
        do("deconv", f"{t}.deconv_layers.0", t, "ConvTranspose_0")
        do("bn", f"{t}.deconv_layers.1", t, "TorchBatchNorm_1")
        do("conv", f"{t}.final_layer", t, "Conv_2")

    # -- encoders (Encoder, encoding.py:39-73) ---------------------------
    for side in ["hand", "obj"]:
        t = f"encoder_{side}"
        do("conv", f"{t}.project", t, "Conv_0")
        for i in range(8):
            do("residual", f"{t}.reg.{i}", t, f"Residual_{i}")

    # -- head_mano (head_mano.py:28-76) -----------------------------------
    do("linear", "head_mano.base_layer.0", "head_mano", "Dense_0")
    do("linear", "head_mano.base_layer.2", "head_mano", "Dense_1")
    do("linear", "head_mano.fc_pose", "head_mano", "Dense_2")
    do("linear", "head_mano.fc_shape", "head_mano", "Dense_3")

    # -- cross modules (cross_module.py:91-137) ---------------------------
    for side in ["hand", "obj"]:
        t = f"cross_{side}"
        do("conv", f"{t}.proj_hand", t, "Conv_0")
        do("conv", f"{t}.proj_obj", t, "Conv_1")
        do("linear", f"{t}.gravity_proj", t, "Dense_0")
        tl = f"{t}.attn.layers.0"
        fl = (t, "TransformerEncoderLayer_0")
        do("mha", f"{tl}.self_attn", *fl, "MultiHeadDotProductAttention_0")
        do("linear", f"{tl}.linear1", *fl, "Dense_0")
        do("linear", f"{tl}.linear2", *fl, "Dense_1")
        do("layernorm", f"{tl}.norm1", *fl, "LayerNorm_0")
        do("layernorm", f"{tl}.norm2", *fl, "LayerNorm_1")
        # sinusoidal positional table: constant, rebuilt by sinusoid_table
        mark_const(f"{t}.pose_embedder.pe")

    # -- head_physics (physics.py:648-721) --------------------------------
    for seq, fname in [("fc_scale", "fc_scale"), ("fc_weight", "fc_weight"),
                       ("fc_CoM", "fc_CoM")]:
        do("linear", f"head_physics.{seq}.0", "head_physics", f"{fname}_0")
        do("linear", f"head_physics.{seq}.2", "head_physics", f"{fname}_1")
    mark_const("head_physics.anchor")  # constant, rebuilt in friction_anchor_dirs

    # -- denoisers (denoiser.py:34-82, ParallelLinear banks) -------------
    for t in ("denoiser_hand", "denoiser_obj"):
        do("fourier", f"{t}.t_encoder.0.W", t, "fourier", "W")
        do("linear", f"{t}.t_encoder.1", t, "t_dense")
        do("linear", f"{t}.pose_encoder.0", t, "pose_dense1")
        do("linear", f"{t}.pose_encoder.2", t, "pose_dense2")
        do("bank", f"{t}.head.head.0", t, "bank", "kernel1", "bias1")
        do("bank", f"{t}.head.head.2", t, "bank", "kernel2", "bias2")


def load_vpho_state_dict(variables, state_dict, remove_keys=()):
    """Map a reference vpho_net torch state_dict into our Flax variables.

    Implements the reference's ``--pretrain`` + ``--remove_pretrained_keys``
    semantics (train_diff_hand_obj.py:39-46): keys starting with any prefix in
    ``remove_keys`` are dropped BEFORE mapping, and missing keys are tolerated
    (load_state_dict(strict=False) behavior).

    Returns (new_variables, report) where report lists imported / skipped /
    unconsumed key groups.
    """
    sd = {k: v for k, v in state_dict.items()
          if not any(k.startswith(r) for r in remove_keys)}
    # strip a possible DDP "module." wrapper
    if sd and all(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}

    imp = _Importer(variables, sd)
    done, missing = [], []

    def do(kind, tkey, *fpath):
        probes = (tkey, tkey + ".weight", tkey + ".conv1.weight",
                  tkey + ".in_proj_weight")
        if not any(p in imp.sd for p in probes):
            missing.append(tkey)
            return
        if kind == "fourier":
            _set(imp.buffers, fpath, imp.t(tkey))
        elif kind == "bank":
            # torch ParallelLinear stores (num, in, out) — same layout as
            # BankMLPHead's kernel/bias params, direct copy
            *scope, kname, bname = fpath
            _set(imp.params, tuple(scope) + (kname,), imp.t(tkey + ".weight"))
            _set(imp.params, tuple(scope) + (bname,), imp.t(tkey + ".bias"))
        else:
            getattr(imp, kind)(tkey, *fpath)
        done.append(tkey)

    _walk_vpho(do, imp.used.add)

    # head_obj registers YCB mesh buffers (head_object.py:13-33) and
    # head_mano.mano_layer registers MANO tables — both are constants our
    # context rebuilds from assets; mark them consumed
    const_prefixes = ("head_obj.", "head_mano.mano_layer.")
    for k in list(imp.sd):
        if k.startswith(const_prefixes):
            imp.used.add(k)

    unconsumed = sorted(set(imp.sd) - imp.used)
    new_vars = dict(variables)
    new_vars["params"] = imp.params
    new_vars["batch_stats"] = imp.stats
    new_vars["buffers"] = imp.buffers
    return new_vars, {"imported": done, "missing": missing,
                      "unconsumed": unconsumed}


# ---------------------------------------------------------------------------
# full vpho_net state_dict EXPORT (Flax variables -> reference torch keys)
# ---------------------------------------------------------------------------


def _get(tree, path: Tuple[str, ...]) -> np.ndarray:
    node = tree
    for k in path:
        node = node[k]
    return np.asarray(node)


class _Exporter:
    """Inverse of _Importer: reads Flax params/stats/buffers, emits torch keys."""

    def __init__(self, variables):
        import jax

        missing = [c for c in ("params", "batch_stats", "buffers")
                   if c not in variables]
        if missing:
            raise ValueError(
                f"export needs the full Flax variables dict with collections "
                f"params/batch_stats/buffers; missing {missing}. A params-only "
                f"pickle (e.g. an EMA-weights dump) cannot be exported — load "
                f"the final_model.pkl written by Trainer.save (it stores all "
                f"three collections).")
        self.params = jax.tree.map(np.asarray, variables["params"])
        self.stats = jax.tree.map(np.asarray, variables["batch_stats"])
        self.buffers = jax.tree.map(np.asarray, variables["buffers"])
        self.sd: Dict[str, np.ndarray] = {}

    def conv(self, tkey, *fpath):
        k = _get(self.params, fpath + ("kernel",))
        self.sd[tkey + ".weight"] = np.transpose(k, (3, 2, 0, 1))
        node = self.params
        for p in fpath:
            node = node[p]
        if "bias" in node:
            self.sd[tkey + ".bias"] = np.asarray(node["bias"])

    def deconv(self, tkey, *fpath):
        # inverse of _deconv: unflip spatial, then (kh,kw,in,out)->(in,out,kh,kw)
        k = _get(self.params, fpath + ("kernel",))[::-1, ::-1]
        self.sd[tkey + ".weight"] = np.transpose(k, (2, 3, 0, 1))

    def linear(self, tkey, *fpath):
        self.sd[tkey + ".weight"] = _get(self.params, fpath + ("kernel",)).T
        self.sd[tkey + ".bias"] = _get(self.params, fpath + ("bias",))

    def bn(self, tkey, *fpath):
        base = fpath + ("BatchNorm_0",)
        self.sd[tkey + ".weight"] = _get(self.params, base + ("scale",))
        self.sd[tkey + ".bias"] = _get(self.params, base + ("bias",))
        self.sd[tkey + ".running_mean"] = _get(self.stats, base + ("mean",))
        self.sd[tkey + ".running_var"] = _get(self.stats, base + ("var",))
        self.sd[tkey + ".num_batches_tracked"] = np.asarray(0, np.int64)

    def residual(self, tkey, *fpath):
        self.bn(tkey + ".bn", *fpath, "TorchBatchNorm_0")
        self.conv(tkey + ".conv1", *fpath, "Conv_0")
        self.bn(tkey + ".bn1", *fpath, "TorchBatchNorm_1")
        self.conv(tkey + ".conv2", *fpath, "Conv_1")
        self.bn(tkey + ".bn2", *fpath, "TorchBatchNorm_2")
        self.conv(tkey + ".conv3", *fpath, "Conv_2")
        node = self.params
        for p in fpath:
            node = node[p]
        if "Conv_3" in node:
            self.conv(tkey + ".conv4", *fpath, "Conv_3")

    def bottleneck(self, tkey, *fpath):
        for i, name in enumerate(["conv1", "conv2", "conv3"]):
            self.conv(tkey + f".{name}", *fpath, f"Conv_{i}")
            self.bn(tkey + f".bn{i+1}", *fpath, f"TorchBatchNorm_{i}")
        node = self.params
        for p in fpath:
            node = node[p]
        if "Conv_3" in node:
            self.conv(tkey + ".downsample.0", *fpath, "Conv_3")
            self.bn(tkey + ".downsample.1", *fpath, "TorchBatchNorm_3")

    def mha(self, tkey, *fpath):
        # inverse of _Importer.mha: reassemble in_proj [q; k; v]
        blocks, biases = [], []
        d = None
        for name in ["query", "key", "value"]:
            k = _get(self.params, fpath + (name, "kernel"))  # (d, h, hd)
            b = _get(self.params, fpath + (name, "bias"))    # (h, hd)
            d = k.shape[0]
            blocks.append(k.reshape(d, -1).T)                # (d, d) rows=out
            biases.append(b.reshape(-1))
        self.sd[tkey + ".in_proj_weight"] = np.concatenate(blocks, axis=0)
        self.sd[tkey + ".in_proj_bias"] = np.concatenate(biases, axis=0)
        wo = _get(self.params, fpath + ("out", "kernel"))    # (h, hd, d)
        self.sd[tkey + ".out_proj.weight"] = wo.reshape(-1, d).T
        self.sd[tkey + ".out_proj.bias"] = _get(self.params, fpath + ("out", "bias"))

    def layernorm(self, tkey, *fpath):
        self.sd[tkey + ".weight"] = _get(self.params, fpath + ("scale",))
        self.sd[tkey + ".bias"] = _get(self.params, fpath + ("bias",))

    def fourier(self, tkey, *fpath):
        self.sd[tkey] = _get(self.buffers, fpath)

    def bank(self, tkey, *fpath):
        *scope, kname, bname = fpath
        self.sd[tkey + ".weight"] = _get(self.params, tuple(scope) + (kname,))
        self.sd[tkey + ".bias"] = _get(self.params, tuple(scope) + (bname,))


def export_vpho_state_dict(variables) -> Dict[str, np.ndarray]:
    """Flax variables -> reference-format torch state_dict (numpy values).

    The inverse of :func:`load_vpho_state_dict`, driven by the SAME
    ``_walk_vpho`` mapping so the directions cannot drift.  Constant buffers
    the reference registers from assets (YCB mesh tables ``head_obj.*``,
    MANO tables ``head_mano.mano_layer.*``, positional tables, anchor dirs)
    are omitted — the reference's ``load_state_dict(strict=False)`` path
    (train_diff_hand_obj.py:45) initializes them from its own assets.

    Lets a reference user take weights trained in this framework back into
    the reference codebase (the reverse trip of ``--pretrain``).
    """
    exp = _Exporter(variables)

    def do(kind, tkey, *fpath):
        getattr(exp, kind)(tkey, *fpath)

    _walk_vpho(do, lambda key: None)
    return exp.sd


def save_torch_file(sd: Dict[str, np.ndarray], path: str):
    """Write a state_dict loadable by ``torch.load`` in the reference."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def remove_flax_prefixes(tree, remove_keys=()):
    """--remove_pretrained_keys for our own flax pickles: drop subtrees whose
    '/'-joined path starts with any prefix."""
    import flax

    flat = flax.traverse_util.flatten_dict(tree)
    kept = {k: v for k, v in flat.items()
            if not any("/".join(k).startswith(r) or ".".join(k).startswith(r)
                       for r in remove_keys)}
    return flax.traverse_util.unflatten_dict(kept)


def export_pkl_to_torch(pkl_path: str, out_path: str):
    """Convert this framework's final_model.pkl to a reference .pth."""
    import pickle

    with open(pkl_path, "rb") as f:
        variables = pickle.load(f)
    save_torch_file(export_vpho_state_dict(variables), out_path)
    return out_path


def load_pretrain(variables, path: str, remove_keys=()):
    """--pretrain dispatch: .pth -> reference torch checkpoint import;
    .pkl -> this framework's own final_model.pkl (merged non-strict)."""
    import pickle

    import flax

    if path.endswith((".pth", ".pt")):
        sd = load_torch_file(path)
        return load_vpho_state_dict(variables, sd, remove_keys)

    with open(path, "rb") as f:
        saved = pickle.load(f)
    report = {"imported": [], "missing": [], "unconsumed": []}
    new_vars = dict(variables)
    for coll in ("params", "batch_stats", "buffers"):
        if coll not in saved or coll not in variables:
            continue
        src = flax.traverse_util.flatten_dict(
            remove_flax_prefixes(saved[coll], remove_keys))
        dst = flax.traverse_util.flatten_dict(variables[coll])
        for k, v in src.items():
            if k in dst:
                assert dst[k].shape == tuple(np.shape(v)), (coll, k)
                dst[k] = np.asarray(v)
                report["imported"].append(coll + "/" + "/".join(k))
            else:
                report["unconsumed"].append(coll + "/" + "/".join(k))
        new_vars[coll] = flax.traverse_util.unflatten_dict(dst)
    return new_vars, report


if __name__ == "__main__":
    # converter CLI:
    #   python -m vpho_tpu.utils.torch_import export final_model.pkl out.pth
    import sys

    if len(sys.argv) == 4 and sys.argv[1] == "export":
        print(export_pkl_to_torch(sys.argv[2], sys.argv[3]))
    else:
        print(__doc__)
        print("usage: python -m vpho_tpu.utils.torch_import export "
              "<final_model.pkl> <out.pth>")
        sys.exit(1)
