"""COCO training CLI — mirrors the reference's ``coco_train.py`` /
``coco_minitrain.py`` argparse schema (samples/coco/coco.py:524-563).

Usage:
  python -m maskrcnn_tf2_tpu.cli.coco_train -backbone=resnet50 -epochs=50 \
      -batch_size=8 -dataset_path=/data/coco [--minitrain] [--img_size=512]
"""

from __future__ import annotations

import argparse

from maskrcnn_tf2_tpu.config import coco_config
from maskrcnn_tf2_tpu.data.augment import get_training_augmentation
from maskrcnn_tf2_tpu.data.coco import CocoDataset
from maskrcnn_tf2_tpu.train.loop import train_model

MINITRAIN_CLASSES = ["person", "bicycle", "car", "motorcycle"]


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-backbone", "--backbone", default="resnet50")
    p.add_argument("-epochs", "--epochs", type=int, default=50)
    p.add_argument("-batch_size", "--batch_size", type=int, default=8)
    p.add_argument("-dataset_path", "--dataset_path", required=True)
    p.add_argument("-img_size", "--img_size", type=int, default=512)
    p.add_argument("-lr", "--learning_rate", type=float, default=1e-3)
    p.add_argument("-optimizer", "--optimizer", default="adamax")
    p.add_argument("--year", default="2017")
    p.add_argument("--minitrain", action="store_true",
                   help="4-class subset (person/bicycle/car/motorcycle)")
    p.add_argument("--n_train", type=int, default=None)
    p.add_argument("--n_val", type=int, default=None)
    p.add_argument("--no_mini_masks", action="store_true",
                   help="disable mini-mask targets (reference default is ON)")
    p.add_argument("--config", default=None,
                   help="YAML config file; CLI flags override file values")
    p.add_argument("--checkpoints_dir", default="logs")
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--augment_weather", action="store_true",
                   help="add the weather set (snow/rain/fog/sun flare; "
                        "reference augmentation.py:30-38)")
    p.add_argument("--augment_extended", action="store_true",
                   help="add the extended set (shift-scale/perspective/CLAHE/"
                        "gamma/sharpen/motion blur/contrast/HSV; "
                        "reference augmentation.py:41-55)")
    p.add_argument(
        "--weights", default=None, dest="backbone_init_weights",
        help="pretrained backbone: 'imagenet' or a .npz/.pt/.pth path "
             "(reference backbone_init_weights, config.py:163)",
    )
    p.add_argument(
        "--device_augment", action="store_true",
        help="fused in-graph flip/scale/photometric augmentation "
             "(replaces the host albumentations pipeline on the hot path)",
    )
    p.add_argument(
        "--sample_cache", default=None,
        help="directory for the pre-decoded npz sample cache "
             "(lets one CPU core feed the chip; see scripts/bench_loader.py)",
    )
    p.add_argument(
        "--sync_bn", action="store_true",
        help="cross-replica BatchNorm statistics over the DP mesh axis "
             "(use when per-device batch is small, e.g. 1 img/chip)",
    )
    return p


def _explicit_flags(argv):
    """Dests the user actually typed (re-parse with every default suppressed
    — argparse leaves un-provided dests out of the namespace entirely)."""
    p = build_argparser()
    for a in p._actions:
        if a.dest != "help":
            a.default = argparse.SUPPRESS
    return set(vars(p.parse_args(argv)))


def main(argv=None):
    args = build_argparser().parse_args(argv)
    class_names = MINITRAIN_CLASSES if args.minitrain else None
    num_classes = (1 + len(class_names)) if class_names else 81

    # With --config, only flags the user explicitly typed override the YAML
    # ("CLI flags override file values" — argparse defaults must not clobber
    # file values the user never asked to change). Without --config, every
    # flag (default or not) feeds coco_config as before.
    provided = _explicit_flags(argv) if args.config else None
    overrides = {}

    def put(key, value, *source_flags):
        if provided is None or any(f in provided for f in source_flags):
            overrides[key] = value

    put("backbone", args.backbone, "backbone")
    put("epochs", args.epochs, "epochs")
    put("batch_size", args.batch_size, "batch_size")
    put("num_classes", num_classes, "minitrain")
    put("image_shape", (args.img_size, args.img_size, 3), "img_size")
    put("image_min_dim", args.img_size, "img_size")
    put("image_max_dim", args.img_size, "img_size")
    put("learning_rate", args.learning_rate, "learning_rate")
    put("optimizer", args.optimizer, "optimizer")
    put("use_mini_masks", not args.no_mini_masks, "no_mini_masks")
    put("checkpoints_dir", args.checkpoints_dir, "checkpoints_dir")
    put(
        "backbone_init_weights", args.backbone_init_weights,
        "backbone_init_weights",
    )
    put("augment_on_device", args.device_augment, "device_augment")
    put(
        "augment_scale_jitter", 0.25 if args.device_augment else 0.0,
        "device_augment",
    )
    put(
        "augment_photometric", 0.2 if args.device_augment else 0.0,
        "device_augment",
    )
    put("sample_cache_dir", args.sample_cache, "sample_cache")
    put("sync_bn", args.sync_bn, "sync_bn")

    if args.config:
        from maskrcnn_tf2_tpu.config import MaskRCNNConfig

        cfg = MaskRCNNConfig.from_yaml(args.config, **overrides)
    else:
        cfg = coco_config(**overrides)

    train_ds = CocoDataset()
    train_ds.load_coco(
        args.dataset_path, "train", args.year,
        class_names=class_names, max_images=args.n_train,
    )
    train_ds.prepare()
    val_ds = CocoDataset()
    val_ds.load_coco(
        args.dataset_path, "val", args.year,
        class_names=class_names, max_images=args.n_val,
    )
    val_ds.prepare()
    print(f"train: {len(train_ds)} images, val: {len(val_ds)} images, "
          f"{cfg.num_classes} classes, backbone={cfg.backbone}")

    # device augment replaces the host pipeline on the hot path (host cv2
    # augment also disables the sample cache — see DataLoader._sample)
    augment = (
        None
        if (args.no_augment or args.device_augment)
        else get_training_augmentation(
            extended=args.augment_extended, weather=args.augment_weather
        )
    )
    train_model(cfg, train_ds, val_ds, augment_fn=augment)


if __name__ == "__main__":
    main()
