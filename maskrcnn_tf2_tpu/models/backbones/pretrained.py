"""Pretrained backbone weight import.

The reference loads ImageNet weights through keras ``classification_models``
(resnet_models.py:292-297, ``backbone_init_weights: 'imagenet'``,
config.py:163). This environment has no network egress, so 'imagenet' is a
*converter* capability here: ``load_backbone_params`` ingests either

  * an ``.npz`` of flax-path-keyed arrays (``backbone/stem/conv/kernel`` ...),
    the framework's own interchange format, or
  * a torch/torchvision ResNet ``state_dict`` (``.pt``/``.pth``), converted
    by name mapping (conv1 -> stem, layer{s}.{b} -> stage{s}_block{b+1},
    OIHW -> HWIO).

Use ``save_backbone_npz`` to re-export converted weights.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def save_backbone_npz(variables, path: str):
    """Export backbone params+batch_stats as a flax-path-keyed npz."""
    flat = {}
    for coll in ("params", "batch_stats"):
        sub = variables.get(coll, {})
        for p, v in _flatten(sub).items():
            flat[coll + "/" + "/".join(p)] = np.asarray(v)
    np.savez(path, **flat)


def load_npz_into_variables(variables, path: str, strict: bool = True):
    """Load a flax-path-keyed npz over ``variables`` (returns new pytree)."""
    data = np.load(path)
    out = {c: dict(_flatten(variables.get(c, {}))) for c in ("params", "batch_stats")}
    loaded = 0
    for key in data.files:
        coll, rest = key.split("/", 1)
        p = tuple(rest.split("/"))
        if p in out.get(coll, {}):
            expect = out[coll][p]
            arr = data[key]
            if expect.shape != arr.shape:
                raise ValueError(f"shape mismatch for {key}: {expect.shape} vs {arr.shape}")
            out[coll][p] = arr.astype(np.asarray(expect).dtype)
            loaded += 1
        elif strict:
            raise KeyError(f"npz key {key} not found in model variables")
    result = dict(variables)
    for c in out:
        result[c] = _unflatten(out[c])
    return result, loaded


# ---------------------------------------------------------------------------
# torchvision ResNet state_dict -> our flax ResNet
# ---------------------------------------------------------------------------

def _torch_resnet_key(name: str) -> Tuple[Tuple[str, ...], str] | None:
    """Map a torchvision ResNet param name to (flax_path, kind).

    kind: 'conv' | 'scale' | 'bias' | 'mean' | 'var' | skip(None).
    """
    if name.startswith("fc."):
        return None  # classifier head not used
    m = re.match(r"conv1\.weight", name)
    if m:
        return (("stem", "conv", "kernel"), "conv")
    m = re.match(r"bn1\.(weight|bias|running_mean|running_var)", name)
    if m:
        kind = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}[m.group(1)]
        return (("stem", "bn"), kind)
    m = re.match(
        r"layer(\d+)\.(\d+)\.(conv|bn)(\d)\.(weight|bias|running_mean|running_var)",
        name,
    )
    if m:
        stage, block, kind_prefix, idx, leaf = m.groups()
        base = (f"stage{stage}_block{int(block) + 1}", f"conv{idx}")
        if kind_prefix == "conv":
            return (base + ("conv", "kernel"), "conv")
        kind = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}[leaf]
        return (base + ("bn",), kind)
    m = re.match(
        r"layer(\d+)\.(\d+)\.downsample\.(0|1)\.(weight|bias|running_mean|running_var)",
        name,
    )
    if m:
        stage, block, which, leaf = m.groups()
        base = (f"stage{stage}_block{int(block) + 1}", "downsample")
        if which == "0":
            return (base + ("conv", "kernel"), "conv")
        kind = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}[leaf]
        return (base + ("bn",), kind)
    return None


def convert_torch_resnet(state_dict) -> Dict[str, Dict]:
    """torchvision ResNet/ResNeXt state_dict -> {'params':..., 'batch_stats':...}
    pytrees matching ``models.backbones.resnet.ResNet`` naming."""
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    for name, tensor in state_dict.items():
        mapped = _torch_resnet_key(name)
        if mapped is None:
            continue
        path, kind = mapped
        arr = np.asarray(tensor)
        if kind == "conv":
            params[path] = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        elif kind == "scale":
            params[path + ("scale",)] = arr
        elif kind == "bias":
            params[path + ("bias",)] = arr
        elif kind == "mean":
            stats[path + ("mean",)] = arr
        elif kind == "var":
            stats[path + ("var",)] = arr
    return {"params": _unflatten(params), "batch_stats": _unflatten(stats)}


def load_backbone_params(variables, source: str):
    """Load pretrained backbone weights from ``source`` into a model's
    variables (the backbone lives under ``.../backbone``). Returns
    (new_variables, n_loaded)."""
    if source.endswith(".npz"):
        return load_npz_into_variables(variables, source, strict=False)
    if source.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(source, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        converted = convert_torch_resnet(sd)
        flat_new = {
            ("params",) + ("backbone",) + p: v
            for p, v in _flatten(converted["params"]).items()
        }
        flat_new.update(
            {
                ("batch_stats", "backbone") + p: v
                for p, v in _flatten(converted["batch_stats"]).items()
            }
        )
        out = {c: dict(_flatten(variables.get(c, {}))) for c in variables}
        loaded = 0
        for path, arr in flat_new.items():
            coll, rest = path[0], path[1:]
            if rest in out.get(coll, {}):
                expect = np.asarray(out[coll][rest])
                if expect.shape == arr.shape:
                    out[coll][rest] = arr.astype(expect.dtype)
                    loaded += 1
        return {c: _unflatten(v) for c, v in out.items()}, loaded
    raise ValueError(
        f"unsupported weight source '{source}' (.npz or torch .pt/.pth); "
        "'imagenet' auto-download is unavailable in a zero-egress environment —"
        " convert a torchvision checkpoint offline with convert_torch_resnet()"
    )
