"""Serving cold-start: AOT engine load vs jit compile (the TRT-engine win).

Builds an engine for the flagship inference config, then measures, in a
FRESH subprocess each (so no in-process executable cache helps either side):
  (a) load_engine + first batch   — the deployed path
  (b) jax.jit + first batch       — the develop path (persistent compile
                                    cache DISABLED, i.e. a cold serving host)

Usage: python scripts/bench_engine.py [--backbone resnet101] [--img 1024]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
from maskrcnn_tf2_tpu.config import MaskRCNNConfig

mode = {mode!r}
cfg = MaskRCNNConfig(
    backbone={backbone!r}, num_classes=2,
    image_shape=({img}, {img}, 3), image_min_dim={img}, image_max_dim={img},
)
imgs = jnp.zeros((1, {img}, {img}, 3), jnp.uint8)
meta = jnp.zeros((1, cfg.meta_size), jnp.float32)
t0 = time.time()
if mode == "engine":
    from maskrcnn_tf2_tpu.export.engine import load_engine
    eng = load_engine({path!r})
    t_load = time.time() - t0
    det, masks = eng(imgs, meta)
    float(det[0, 0, 0])
    t_first = time.time() - t0
else:
    from maskrcnn_tf2_tpu.models import MaskRCNN
    from maskrcnn_tf2_tpu.utils.platform import inference_compiler_options
    import pickle
    with open({path!r}, "rb") as f:
        payload = pickle.load(f)
    variables = payload["variables"]
    model = MaskRCNN(cfg)
    from functools import partial
    @partial(jax.jit, compiler_options=inference_compiler_options())
    def infer(v, i, m):
        out = model.apply(v, i, m, train=False)
        cls = out["detections"][..., 4].astype(jnp.int32)
        return out["detections"], jnp.take_along_axis(
            out["mrcnn_masks"], cls[:, :, None, None, None], axis=-1)[..., 0]
    t_load = time.time() - t0
    det, masks = infer(variables, imgs, meta)
    np.asarray(det)
    t_first = time.time() - t0
print(json.dumps({{"mode": mode, "t_load_s": round(t_load, 2),
                   "t_first_batch_s": round(t_first, 2)}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet101")
    ap.add_argument("--img", type=int, default=1024)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from maskrcnn_tf2_tpu.config import MaskRCNNConfig
    from maskrcnn_tf2_tpu.export.engine import build_engine
    from maskrcnn_tf2_tpu.models import MaskRCNN
    from maskrcnn_tf2_tpu.ops.image import compose_image_meta
    import numpy as np

    cfg = MaskRCNNConfig(
        backbone=args.backbone,
        num_classes=2,
        image_shape=(args.img, args.img, 3),
        image_min_dim=args.img,
        image_max_dim=args.img,
    )
    model = MaskRCNN(cfg)
    imgs = jnp.zeros((1, args.img, args.img, 3), jnp.uint8)
    meta = jnp.asarray(
        compose_image_meta(
            0, (args.img, args.img, 3), (args.img, args.img, 3),
            (0, 0, args.img, args.img), 1.0, np.ones(2),
        )
    )[None].astype(jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r}, imgs, meta, train=False)
    )(jax.random.PRNGKey(0))

    path = os.path.join(tempfile.gettempdir(), f"mrcnn_{args.backbone}_{args.img}.engine")
    import time

    t0 = time.time()
    build_engine(cfg, variables, path, batch_size=1)
    t_build = time.time() - t0
    size_mb = os.path.getsize(path) / 1e6
    print(f"engine built in {t_build:.1f} s, {size_mb:.1f} MB: {path}")

    env = dict(os.environ)
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"  # cold host on both sides
    for mode in ("engine", "jit"):
        code = CHILD.format(
            repo=repo, mode=mode, backbone=args.backbone, img=args.img, path=path
        )
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True,
            timeout=1800,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            print(f"{mode} FAILED:\n{out.stderr[-2000:]}")
            continue
        print(line[-1])


if __name__ == "__main__":
    main()
