"""Typed configuration for the TPU-native Mask R-CNN framework.

Mirrors the knob *semantics* of the reference's flat ``CONFIG`` dict
(``src/common/config.py:9-179``) as a frozen dataclass so it can be closed over
by jitted functions as a static value. Every field keeps the reference's name
and default where one exists; fields that only made sense for the Keras/
multiprocessing runtime (``use_multiprocessing``, ``queue_multiplier`` ...)
are replaced by their TPU-native equivalents.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Any, Mapping, Tuple

# Default 2-class (background + balloon) dictionary, matching the reference's
# CLASS_DICT at src/common/config.py:6.
DEFAULT_CLASS_DICT = {"background": 0, "balloon": 1}


def _tuplify(x):
    if isinstance(x, (list, tuple)):
        return tuple(_tuplify(v) for v in x)
    return x


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    """Static hyperparameters for model build, data pipeline and training.

    Frozen + hashable so instances can be passed as static args to ``jax.jit``.
    """

    # ---- image geometry (reference config.py:20-34) ----
    image_shape: Tuple[int, int, int] = (512, 512, 3)
    image_min_dim: int = 300
    image_min_scale: float = 0.0
    image_max_dim: int = 512
    image_resize_mode: str = "square"  # square | pad64 | crop | none

    # ---- classes ----
    num_classes: int = len(DEFAULT_CLASS_DICT)

    # ---- normalization (reference config.py:29; preprocess.py:495-530) ----
    # "imagenet": (x/255 - mean) / std. "maxmin": per-image
    # (x - min) / (max - min) — the reference's normalize=None path
    # (maxmin_normalize_input, preprocess.py:520-530).
    normalization: str = "imagenet"  # imagenet | maxmin
    pixel_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    pixel_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    # ---- masks (reference config.py:38-43) ----
    # Reference default is ON (config.py:38-43, use_mini_mask + 56x56):
    # full-resolution mask targets also cost ~80 ms/step on v5e (4-corner
    # gathers over [G, H, W] masks — see ops/targets.py mask-target crop).
    use_mini_masks: bool = True
    mini_mask_shape: Tuple[int, int] = (56, 56)
    mask_shape: Tuple[int, int] = (28, 28)

    # ---- backbone / FPN (reference config.py:22, 70-73) ----
    backbone: str = "resnet18"
    backbone_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    top_down_pyramid_size: int = 256
    backbone_init_weights: str | None = None  # None | 'imagenet' | path
    train_bn: bool = True
    train_bn_backbone: bool = True
    # Cross-replica BN statistics (psum over the "data" mesh axis inside
    # every BatchNorm). Per-shard BN is statistically broken at small
    # per-device batch (1 img/shard on an 8-chip DP mesh); the reference is
    # single-GPU so has no equivalent knob. Requires the shard_map train
    # path (the default train loop / DP step); plain single-device jit of
    # the train step will fail with an unbound-axis error if this is set.
    sync_bn: bool = False

    # ---- anchors (reference config.py:75-84) ----
    rpn_anchor_scales: Tuple[int, ...] = (32, 64, 128, 256, 512)
    rpn_anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_anchor_stride: int = 1

    # ---- RPN / proposals (reference config.py:86-124) ----
    rpn_train_anchors_per_image: int = 256
    max_gt_instances: int = 100
    rpn_bbox_std_dev: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    bbox_std_dev: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    rpn_nms_threshold: float = 0.7
    use_rpn_rois: bool = True
    random_rois: int = 0
    pre_nms_limit: int = 6000
    post_nms_rois_training: int = 2000
    post_nms_rois_inference: int = 1000
    # TPU PartialReduce (approx_max_k, expected recall >=0.99) for the
    # pre-NMS anchor top-k instead of the full 262k-anchor sort (5.3 ms at
    # b16/1024px on v5e). Lowers to EXACT top_k on CPU, so oracle tests and
    # the reference's tf.nn.top_k semantics are preserved off-TPU. Only
    # kicks in when anchors >= 4x pre_nms_limit.
    proposal_approx_topk: bool = True
    # Slim RPN inference funnel (models/rpn.py mode='slim'): per-anchor fused
    # (fg-bg logit diff, deltas) rows; score ORDER — the only thing proposal
    # generation consumes — is preserved exactly (sigmoid is monotone).
    # TPU-only at trace time (models/mask_rcnn.py::_rpn_slim_enabled); the
    # CPU oracle path is bit-unchanged.
    rpn_slim_inference: bool = True

    # ---- detection (reference config.py:106-112) ----
    detection_min_confidence: float = 0.7
    detection_nms_threshold: float = 0.3
    detection_max_instances: int = 100

    # ---- ROI heads (reference config.py:126-138) ----
    train_rois_per_image: int = 200
    roi_positive_ratio: float = 0.33
    pool_size: int = 7
    mask_pool_size: int = 14
    fpn_cls_fc_layers_size: int = 1024
    # Mask-head 3x3 conv width. The reference hardcodes 256
    # (mrcnn_layers.py:1201-1267); the default preserves parity, smaller
    # values give proportionally lighter heads for small/embedded models
    # (the mask head dominates ROI-head FLOPs: 4 convs + deconv per ROI).
    mask_conv_channels: int = 256
    # Train-time mask head computes only the GT class's channel of the
    # final 1x1 conv (always EXACT — the loss gathers that channel anyway,
    # reference losses.py:190-235, and no BN follows the projection), and —
    # when the head BNs run on moving averages (train_bn=False, the
    # reference COCO CLI's own default: store_true at coco.py:555) — runs
    # only on the leading int(train_rois_per_image * roi_positive_ratio)
    # ROI slots, which hold every positive by construction (ops/targets.py
    # prio sort; the loss zero-weights the rest). The reference computes
    # the full [T, 28, 28, C] head (mrcnn_layers.py:1201-1267) — ~3x the
    # mask-head FLOPs plus a [B*T, 28, 28, C] f32 intermediate for outputs
    # the loss multiplies by zero. Under train_bn=True the slot slicing
    # stays off automatically (it would change the heads' batch
    # statistics); the channel projection still applies.
    # Off = reference-shaped full compute.
    mask_train_slim: bool = True

    # ---- losses / regularization (reference config.py:141, 152-156) ----
    # Order: rpn_class, rpn_bbox, mrcnn_class, mrcnn_bbox, mrcnn_mask
    loss_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0)
    weight_decay: float = 2e-4
    l2_reg_batchnorm: bool = False

    # ---- optimizer (reference config.py:144-149) ----
    optimizer: str = "adamax"
    learning_rate: float = 1e-3
    clipvalue: float | None = 5.0
    clipnorm: float | None = None

    # ---- training loop (reference config.py:45-55) ----
    epochs: int = 100
    batch_size: int = 1
    log_per_steps: int = 5
    prefetch_size: int = 2  # device prefetch depth (replaces CPU worker queue)

    # ---- device-side augmentation (SURVEY §2.10 TPU plan; the host-side
    # albumentations-equivalent pipeline in data/augment.py remains for the
    # heavy transforms). Runs fused inside the jitted train step. ----
    augment_on_device: bool = False
    augment_flip: bool = True
    augment_scale_jitter: float = 0.0  # zoom-out only, e.g. 0.25
    augment_photometric: float = 0.0  # brightness/contrast strength, e.g. 0.2

    # ---- host sample cache: decode/resize once, mmap npz afterwards (lets
    # one CPU core feed the chip at train rates; see scripts/bench_loader.py)
    sample_cache_dir: str | None = None

    # ---- callbacks-equivalent knobs (reference config.py:57-68) ----
    checkpoints_dir: str = "logs"
    reduce_lr_factor: float = 0.98
    reduce_lr_patience: int = 10
    save_best_only: bool = True

    # ---- activation options (reference config.py:166-170) ----
    resnet_leaky_relu: bool = False
    mask_head_leaky_relu: bool = False
    cls_head_leaky_relu: bool = False

    # ---- multistage training (reference config.py:173-177) ----
    tune_rpn_model_only: bool = False
    frozen_backbone: bool = False
    frozen_rpn_model: bool = False
    frozen_mask_head: bool = False
    frozen_cls_head: bool = False

    # ---- TPU-native additions (no reference equivalent) ----
    compute_dtype: str = "bfloat16"  # activations dtype on TPU
    mesh_data_axis: str = "data"  # data-parallel mesh axis name
    mesh_model_axis: str = "model"  # tensor-parallel mesh axis name
    # Distributed step flavor: "shard_map" = explicit per-shard program with
    # ONE fused gradient all-reduce (the measured default); "gspmd" = jit the
    # unmodified global-batch step with `in_shardings` and let XLA's SPMD
    # partitioner insert collectives (scaling-book recipe). tp_shards > 1
    # shards the wide FC classifier head (fpn_cls_fc_layers_size, reference
    # mrcnn_layers.py:1124-1198) column-/row-parallel over the "model" axis —
    # gspmd mode only.
    parallel_mode: str = "shard_map"
    tp_shards: int = 1
    # Int8 post-training quantization — the TPU-native analog of the
    # reference's TRT deployment story (README.md:460-503 ships fp16; int8
    # is TRT's next notch). v5e's MXU runs int8 x int8 -> int32 at 2x the
    # bf16 rate (measured 259.8 vs 159.6 TOP/s incl. dequant epilogue,
    # scripts/microbench_int8.py). "calib": an inference forward records
    # each conv input's running amax into the 'quant' collection;
    # "int8": those convs run int8 with per-output-channel weight scales,
    # dequant fused by XLA into the eval-mode BN epilogue. Inference-only
    # (the train step rejects it); ResNet-family backbones.
    quant_mode: str = "off"  # off | calib | int8
    # Extend quant_mode to the mask head's four 3x3 convs. Opt-in while its
    # win/AP cost is being characterized (r50/r101 mask head = ~12-15 ms of
    # the 182 ms int8 step; small 14x14 spatial may not amortize the
    # quantize passes — measure before defaulting on).
    quant_mask_head: bool = False
    # Extend quant_mode to the classifier head's two wide FC layers
    # (mrcnn_class_conv1: 12544x1024 on every ROI row, conv2: 1024x1024).
    # MEASURED NEUTRAL (R101@1024 b32 v5e: 176.0 vs 176.1 img/s): the int8
    # quantize pass re-reads the ~800 MB pooled-ROI tensor, canceling the
    # ~2 ms MXU saving of the 5 ms FC1. Kept opt-in (same policy as
    # quant_mask_head); don't default on without re-measuring.
    quant_classifier: bool = False
    debug_nans: bool = False
    # Non-finite update guard: "loss" checks the scalar total loss (the
    # reference's check_loss_nan semantics, model.py:64-84 — O(1) cost),
    # "full" additionally isfinite-scans every optimizer update tensor
    # (~20 ms/step at r50@512 b8 on v5e), "off" disables skipping.
    nonfinite_guard: str = "loss"

    # ------------------------------------------------------------------
    def __post_init__(self):
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, list):
                object.__setattr__(self, f.name, _tuplify(v))
        assert self.image_resize_mode in ("square", "pad64", "crop", "none")
        assert self.normalization in ("imagenet", "maxmin")
        assert len(self.rpn_anchor_scales) == len(self.backbone_strides), (
            "one anchor scale per pyramid level"
        )
        assert self.parallel_mode in ("shard_map", "gspmd")
        assert self.quant_mode in ("off", "calib", "int8")
        assert self.tp_shards >= 1
        if self.tp_shards > 1:
            assert self.parallel_mode == "gspmd", (
                "tensor parallelism (tp_shards > 1) is implemented via the "
                "XLA SPMD partitioner — set parallel_mode='gspmd'"
            )
            assert self.fpn_cls_fc_layers_size % self.tp_shards == 0

    # ---- derived quantities ----
    @property
    def meta_size(self) -> int:
        """Length of the image-meta vector.

        Contract (reference utils.py:494-516): ``[image_id(1), original_shape(3),
        resized_shape(3), window(4), scale(1), active_class_ids(num_classes)]``.
        """
        return 1 + 3 + 3 + 4 + 1 + self.num_classes

    @property
    def num_pyramid_levels(self) -> int:
        return len(self.backbone_strides)

    @property
    def anchors_per_location(self) -> int:
        return len(self.rpn_anchor_ratios)

    def backbone_feature_shapes(self) -> Tuple[Tuple[int, int], ...]:
        """Spatial shape of each pyramid level (reference utils.py:725-735)."""
        h, w = self.image_shape[0], self.image_shape[1]
        return tuple(
            (int((h + s - 1) // s), int((w + s - 1) // s))
            for s in self.backbone_strides
        )

    def num_anchors(self) -> int:
        return sum(
            hh * ww * self.anchors_per_location
            for hh, ww in self.backbone_feature_shapes()
        )

    def post_nms_rois(self, training: bool) -> int:
        return self.post_nms_rois_training if training else self.post_nms_rois_inference

    # ---- construction / serialization ----
    def replace(self, **kw) -> "MaskRCNNConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "MaskRCNNConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def md5(self) -> str:
        """Config hash used in checkpoint names (reference training.py:114-116)."""
        blob = json.dumps(self.to_dict(), sort_keys=True, default=str)
        return hashlib.md5(blob.encode()).hexdigest()

    # ---- YAML round-trip (the reference threads a plain dict everywhere;
    # a file-backed config is the natural upgrade for a typed dataclass) ----
    def to_yaml(self, path: str) -> None:
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=True)

    @classmethod
    def from_yaml(cls, path: str, **overrides) -> "MaskRCNNConfig":
        """Load a config from YAML; unknown keys are rejected loudly (a
        typo'd knob silently using its default is worse than an error).
        ``overrides`` (e.g. CLI flags) win over file values."""
        import yaml

        with open(path) as f:
            d = yaml.safe_load(f) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
        d.update(overrides)
        return cls(**d)


# Named preset mirroring the reference's COCO_CONFIG (samples/coco/coco.py:30-115).
def coco_config(**overrides) -> MaskRCNNConfig:
    base = dict(
        num_classes=81,
        image_shape=(512, 512, 3),
        image_min_dim=512,
        image_max_dim=512,
        max_gt_instances=100,
        # mini-masks keep mask-target sampling on the separable-matmul fast
        # path and cut host->device mask traffic ~80x
        use_mini_masks=True,
        mini_mask_shape=(56, 56),
    )
    base.update(overrides)
    return MaskRCNNConfig(**base)
