"""Map profiler op names (fusion.25, copy.1324, ...) to their HLO bodies.

Compiles the same inference graph as prof_infer.py (cache-hit, so fast) and
prints, for each requested op name, the fusion's computation body summary:
root op, output shape, and any convolution/dot/reduce ops inside.

    python scripts/hlo_lookup.py fusion.25 fusion.38 fusion.1443 copy.1324
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.models import MaskRCNN
from maskrcnn_tf2_tpu.ops.image import compose_image_meta
from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache


def main():
    names = [a for a in sys.argv[1:] if not a.isdigit()]
    digits = [int(a) for a in sys.argv[1:] if a.isdigit()]
    batch = digits[0] if digits else 16
    size, backbone = 1024, "resnet101"

    enable_cache()
    cfg = MaskRCNNConfig(
        image_shape=(size, size, 3),
        num_classes=2,
        backbone=backbone,
        compute_dtype="bfloat16",
        image_min_dim=size,
        image_max_dim=size,
    )
    model = MaskRCNN(cfg)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, 3).astype(np.float32)
    )
    meta = jnp.tile(
        jnp.asarray(
            compose_image_meta(
                0, (size, size, 3), (size, size, 3), (0, 0, size, size), 1.0,
                np.ones(cfg.num_classes),
            )
        ),
        (batch, 1),
    )
    # init EXACTLY like prof_infer.py so the compile cache warmed by a
    # profiling run is hit here (closed-over params are HLO constants and
    # thus part of the cache key)
    variables = jax.jit(
        lambda r: model.init({"params": r}, images, meta, train=False)
    )(jax.random.PRNGKey(0))

    def infer(images, meta):
        out = model.apply(variables, images, meta, train=False)
        return out["detections"], out["mrcnn_masks"]

    compiled = jax.jit(infer).lower(images, meta).compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)} chars", flush=True)

    # index: instruction name -> line; computation name -> body lines
    comp_bodies = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"\s*%?([\w\.\-]+)\s*(?:\([^)]*\))?\s*->?.*{\s*$", line)
        if line.rstrip().endswith("{") and ("fused_computation" in line or "%" in line):
            mm = re.search(r"%([\w\.\-]+)", line)
            if mm:
                cur = mm.group(1)
                comp_bodies[cur] = []
            continue
        if line.strip() == "}":
            cur = None
            continue
        if cur is not None:
            comp_bodies[cur].append(line.strip())

    # find instruction lines for requested names
    inst = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=", line)
        if m and m.group(1) in names:
            inst[m.group(1)] = line.strip()

    for n in names:
        print("=" * 70)
        print(f"## {n}")
        line = inst.get(n)
        if not line:
            print("  (not found)")
            continue
        print(f"  {line[:400]}")
        m = re.search(r"calls=%?([\w\.\-]+)", line)
        if m:
            body = comp_bodies.get(m.group(1), [])
            interesting = [
                b for b in body
                if re.search(r"convolution|dot\(|dot\.|reduce|gather|scatter|"
                             r"iota|sort|transpose|concatenate", b)
            ]
            print(f"  body: {len(body)} instrs, showing interesting:")
            for b in interesting[:15]:
                print(f"    {b[:300]}")
            if not interesting:
                for b in body[:10]:
                    print(f"    {b[:300]}")


if __name__ == "__main__":
    main()
