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
        if p not in out.get(coll, {}) and ("backbone",) + p in out.get(coll, {}):
            # npz exported from a bare backbone, loading into the full model
            p = ("backbone",) + p
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
    # SENet154 deep stem (timm legacy_senet154): layer0.conv{1,2,3} /
    # layer0.bn{1,2,3} -> our stem{1,2,3} ConvBN trio (the reference's
    # 3x 3x3 stem, senet_models.py:270-303; resnet.py deep_stem=True).
    m = re.match(r"layer0\.conv(\d)\.weight", name)
    if m:
        return ((f"stem{m.group(1)}", "conv", "kernel"), "conv")
    m = re.match(r"layer0\.bn(\d)\.(weight|bias|running_mean|running_var)", name)
    if m:
        kind = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}[m.group(2)]
        return ((f"stem{m.group(1)}", "bn"), kind)
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
    # SE blocks (timm legacy_seresnet / classification_models style):
    # layer{s}.{b}.se_module.fc{i} (1x1 conv) or .se.fc{i} (linear) ->
    # our SqueezeExcite Dense fc{i} (models/backbones/resnet.py:26-42).
    m = re.match(
        r"layer(\d+)\.(\d+)\.(?:se_module|se)\.fc(\d)\.(weight|bias)", name
    )
    if m:
        stage, block, idx, leaf = m.groups()
        base = (f"stage{stage}_block{int(block) + 1}", "se", f"fc{idx}")
        return (base + ("kernel" if leaf == "weight" else "bias",), "dense")
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
        elif kind == "dense":
            # 1x1 conv [O, I, 1, 1] or linear [O, I] -> Dense kernel [I, O]
            if path[-1] == "kernel":
                arr = arr.reshape(arr.shape[0], arr.shape[1]).T
            params[path] = arr
        elif kind == "scale":
            params[path + ("scale",)] = arr
        elif kind == "bias":
            params[path + ("bias",)] = arr
        elif kind == "mean":
            stats[path + ("mean",)] = arr
        elif kind == "var":
            stats[path + ("var",)] = arr
    return {"params": _unflatten(params), "batch_stats": _unflatten(stats)}


# ---------------------------------------------------------------------------
# torchvision MobileNetV2 state_dict -> our flax MobileNetV2
# ---------------------------------------------------------------------------

def _emit_conv_bn(params, stats, base_name, conv_arr=None, bn=None, depthwise=False):
    """Write a {name}_conv / {name}_bn pair (mobilenet/efficientnet naming)."""
    if conv_arr is not None:
        params[(f"{base_name}_conv", "kernel")] = np.transpose(conv_arr, (2, 3, 1, 0))
    if bn:
        for leaf, arr in bn.items():
            coll = params if leaf in ("scale", "bias") else stats
            coll[(f"{base_name}_bn", leaf)] = arr


_BN_LEAF = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}


def _collect_torch_bn(sd, prefix):
    out = {}
    for tleaf, fleaf in _BN_LEAF.items():
        key = f"{prefix}.{tleaf}"
        if key in sd:
            out[fleaf] = np.asarray(sd[key])
    return out or None


def convert_torch_mobilenet_v2(state_dict) -> Dict[str, Dict]:
    """torchvision ``mobilenet_v2`` state_dict -> flax ``MobileNetV2`` pytrees.

    torchvision layout: ``features.0`` = stem ConvBNReLU; ``features.1..17`` =
    InvertedResidual blocks whose ``conv`` Sequential is either
    [dw ConvBN, project conv, project bn] (expand == 1, block 1) or
    [expand ConvBN, dw ConvBN, project conv, project bn]; ``features.18``
    (the classifier's 1280-wide head conv) has no counterpart in the detector
    backbone and is skipped. Ours: stem / block{0..16} with
    expand_/dw_/project_ conv+bn (models/backbones/mobilenet.py:102-145).
    """
    sd = {k: v for k, v in state_dict.items()}
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    _emit_conv_bn(
        params, stats, "stem",
        np.asarray(sd["features.0.0.weight"]),
        _collect_torch_bn(sd, "features.0.1"),
    )
    for i in range(1, 18):
        block = f"block{i - 1}"
        has_expand = f"features.{i}.conv.1.0.weight" in sd
        if has_expand:
            groups = [("expand", "conv.0.0", "conv.0.1"),
                      ("dw", "conv.1.0", "conv.1.1"),
                      ("project", "conv.2", "conv.3")]
        else:
            groups = [("dw", "conv.0.0", "conv.0.1"),
                      ("project", "conv.1", "conv.2")]
        for ours, conv_key, bn_key in groups:
            w = sd.get(f"features.{i}.{conv_key}.weight")
            if w is None:
                continue
            sub_params: Dict[Tuple[str, ...], np.ndarray] = {}
            _emit_conv_bn(
                sub_params, stats_sub := {},
                f"{ours}", np.asarray(w), _collect_torch_bn(sd, f"features.{i}.{bn_key}")
            )
            for p, v in sub_params.items():
                params[(block,) + p] = v
            for p, v in stats_sub.items():
                stats[(block,) + p] = v
    return {"params": _unflatten(params), "batch_stats": _unflatten(stats)}


# ---------------------------------------------------------------------------
# timm EfficientNet state_dict -> our flax EfficientNet
# ---------------------------------------------------------------------------

def convert_timm_efficientnet(state_dict) -> Dict[str, Dict]:
    """timm ``efficientnet_b*`` state_dict -> flax ``EfficientNet`` pytrees.

    timm layout: ``conv_stem``/``bn1`` stem; ``blocks.{s}.{b}`` MBConv with
    ``conv_pw``/``bn1`` (expand), ``conv_dw``/``bn2``, ``se.conv_reduce``/
    ``se.conv_expand`` (1x1 convs), ``conv_pwl``/``bn3`` (project); stage 0
    (DepthwiseSeparableConv) has no expand and names dw/project as
    ``conv_dw``/``bn1`` + ``conv_pw``/``bn2``. The final ``conv_head`` has no
    backbone counterpart. Ours: stem / flat block{idx} with expand_/dw_/
    project_ conv+bn and se_reduce/se_expand Dense
    (models/backbones/efficientnet.py:76-140).
    """
    sd = {k: v for k, v in state_dict.items()}
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    _emit_conv_bn(
        params, stats, "stem", np.asarray(sd["conv_stem.weight"]),
        _collect_torch_bn(sd, "bn1"),
    )
    # Flatten timm's per-stage block numbering to our global block index.
    stage_blocks = []
    s = 0
    while f"blocks.{s}.0.conv_dw.weight" in sd or f"blocks.{s}.0.conv_pw.weight" in sd:
        b = 0
        while any(
            f"blocks.{s}.{b}.{k}" in sd
            for k in ("conv_dw.weight", "conv_pw.weight")
        ):
            stage_blocks.append((s, b))
            b += 1
        s += 1
    for bidx, (s, b) in enumerate(stage_blocks):
        pre = f"blocks.{s}.{b}"
        block = f"block{bidx}"
        has_expand = f"{pre}.conv_pwl.weight" in sd  # 3-conv MBConv
        if has_expand:
            groups = [("expand", "conv_pw", "bn1"),
                      ("dw", "conv_dw", "bn2"),
                      ("project", "conv_pwl", "bn3")]
        else:  # DepthwiseSeparableConv: dw + pw(project)
            groups = [("dw", "conv_dw", "bn1"), ("project", "conv_pw", "bn2")]
        for ours, conv_key, bn_key in groups:
            w = sd.get(f"{pre}.{conv_key}.weight")
            if w is None:
                continue
            sub_p: Dict[Tuple[str, ...], np.ndarray] = {}
            sub_s: Dict[Tuple[str, ...], np.ndarray] = {}
            _emit_conv_bn(sub_p, sub_s, ours, np.asarray(w),
                          _collect_torch_bn(sd, f"{pre}.{bn_key}"))
            for p, v in sub_p.items():
                params[(block,) + p] = v
            for p, v in sub_s.items():
                stats[(block,) + p] = v
        for timm_se, ours_se in (("conv_reduce", "se_reduce"), ("conv_expand", "se_expand")):
            w = sd.get(f"{pre}.se.{timm_se}.weight")
            if w is not None:
                arr = np.asarray(w)
                params[(block, ours_se, "kernel")] = arr.reshape(
                    arr.shape[0], arr.shape[1]
                ).T
            bkey = sd.get(f"{pre}.se.{timm_se}.bias")
            if bkey is not None:
                params[(block, ours_se, "bias")] = np.asarray(bkey)
    return {"params": _unflatten(params), "batch_stats": _unflatten(stats)}


def convert_timm_mobilenet_v1(state_dict) -> Dict[str, Dict]:
    """timm ``mobilenetv1_100`` state_dict -> flax ``MobileNetV1`` pytrees.

    timm layout: ``conv_stem``/``bn1`` stem; ``blocks.{s}.{b}`` is a
    DepthwiseSeparableConv with ``conv_dw``/``bn1`` + ``conv_pw``/``bn2`` —
    13 blocks total in row-major (stage, block) order. Ours: flat top-level
    ``stem_conv``/``stem_bn`` + ``b{1..13}_{dw,pw}_{conv,bn}``
    (models/backbones/mobilenet.py:34-75; reference factory row
    models_factory.py:59). Depthwise kernels transpose
    ``[C, 1, kh, kw] -> [kh, kw, 1, C]`` like every other dw site here.
    """
    sd = {k: v for k, v in state_dict.items()}
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    _emit_conv_bn(
        params, stats, "stem", np.asarray(sd["conv_stem.weight"]),
        _collect_torch_bn(sd, "bn1"),
    )
    idx = 0
    s = 0
    while f"blocks.{s}.0.conv_dw.weight" in sd:
        b = 0
        while f"blocks.{s}.{b}.conv_dw.weight" in sd:
            idx += 1
            pre = f"blocks.{s}.{b}"
            _emit_conv_bn(
                params, stats, f"b{idx}_dw",
                np.asarray(sd[f"{pre}.conv_dw.weight"]),
                _collect_torch_bn(sd, f"{pre}.bn1"),
            )
            _emit_conv_bn(
                params, stats, f"b{idx}_pw",
                np.asarray(sd[f"{pre}.conv_pw.weight"]),
                _collect_torch_bn(sd, f"{pre}.bn2"),
            )
            b += 1
        s += 1
    return {"params": _unflatten(params), "batch_stats": _unflatten(stats)}


def convert_torch_backbone(state_dict, backbone: str | None = None) -> Dict[str, Dict]:
    """Dispatch a torch state_dict to the right converter, sniffing the
    layout when ``backbone`` doesn't decide it."""
    keys = set(state_dict.keys())
    if any(k.startswith("conv_stem") for k in keys):
        # timm mobilenetv1_100 and timm efficientnet_b* share the conv_stem/
        # blocks skeleton; only EfficientNet has 3-conv MBConv blocks
        # (conv_pwl) and SE convs.
        if any(".conv_pwl." in k or ".se." in k for k in keys):
            return convert_timm_efficientnet(state_dict)
        return convert_timm_mobilenet_v1(state_dict)
    if any(k.startswith("features.0.0") for k in keys):
        return convert_torch_mobilenet_v2(state_dict)
    return convert_torch_resnet(state_dict)


def backbone_leaf_count(variables) -> int:
    """Number of param/batch_stats leaves under the ``backbone`` submodule."""
    n = 0
    for coll in ("params", "batch_stats"):
        sub = variables.get(coll, {})
        if isinstance(sub, dict) and "backbone" in sub:
            n += len(_flatten(sub["backbone"]))
    return n


def load_backbone_params(variables, source: str, backbone: str | None = None):
    """Load pretrained backbone weights from ``source`` into a model's
    variables (the backbone lives under ``.../backbone``). Returns
    (new_variables, n_loaded).

    Sources: flax-path-keyed ``.npz`` (this framework's interchange format,
    any backbone) or a torch ``.pt``/``.pth`` state_dict (torchvision
    ResNet/ResNeXt, timm SE-ResNet/SENet154, torchvision MobileNetV2, timm
    MobileNetV1, timm EfficientNet — layout auto-sniffed; every
    ``backbone_names()`` key has a converter). The reference equivalent is
    ``backbone_init_weights: 'imagenet'`` resolved through keras
    classification_models (resnet_models.py:292-297, config.py:163).
    """
    if source.endswith(".npz"):
        return load_npz_into_variables(variables, source, strict=False)
    if source.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(source, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        converted = convert_torch_backbone(sd, backbone)
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
        " convert a torchvision/timm checkpoint offline with convert_torch_backbone()"
    )


def init_backbone_weights(variables, config):
    """Consume ``config.backbone_init_weights`` (the reference's
    ``backbone_init_weights`` knob, config.py:163): load pretrained backbone
    weights into freshly initialized model variables and report coverage.

    Accepts a filesystem path (.npz / .pt / .pth) or the literal 'imagenet',
    which resolves to ``$MASKRCNN_TPU_WEIGHTS_DIR/{backbone}.npz`` (or
    ``~/.cache/maskrcnn_tf2_tpu/weights/{backbone}.npz``) since this
    environment cannot download. Raises if fewer than 90% of backbone leaves
    are covered — a silent partial load would train a mostly-random backbone
    while claiming pretrained init.
    """
    import os

    source = config.backbone_init_weights
    if source in (None, "", "none", "random"):
        return variables, 0
    if source == "imagenet":
        root = os.environ.get(
            "MASKRCNN_TPU_WEIGHTS_DIR",
            os.path.expanduser("~/.cache/maskrcnn_tf2_tpu/weights"),
        )
        source = os.path.join(root, f"{config.backbone}.npz")
        if not os.path.exists(source):
            raise FileNotFoundError(
                f"backbone_init_weights='imagenet' expects {source}; this "
                "environment has no egress — place a converted checkpoint "
                "there (save_backbone_npz / convert_torch_backbone)"
            )
    new_vars, loaded = load_backbone_params(variables, source, config.backbone)
    total = backbone_leaf_count(variables)
    if total and loaded < 0.9 * total:
        raise ValueError(
            f"pretrained load covered only {loaded}/{total} backbone leaves "
            f"from '{source}' — wrong checkpoint for backbone "
            f"'{config.backbone}'?"
        )
    print(f"loaded pretrained backbone: {loaded}/{total} leaves from {source}")
    return new_vars, loaded
