import sys, os, time, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.models import MaskRCNN
from maskrcnn_tf2_tpu.ops.image import compose_image_meta
from maskrcnn_tf2_tpu.ops.proposal import generate_proposals
from maskrcnn_tf2_tpu.ops.anchors import get_anchors
from maskrcnn_tf2_tpu.ops.roi_align import pyramid_roi_align

stage = sys.argv[1]
cfg = MaskRCNNConfig(image_shape=(1024,1024,3), num_classes=2, backbone="resnet101",
                     compute_dtype="bfloat16", image_min_dim=1024, image_max_dim=1024)
model = MaskRCNN(cfg)
B=4
imgs = jnp.asarray(np.random.RandomState(0).rand(B,1024,1024,3).astype(np.float32))
meta = jnp.tile(jnp.asarray(compose_image_meta(0,(1024,1024,3),(1024,1024,3),(0,0,1024,1024),1.0,np.ones(2))),(B,1))
v = jax.jit(lambda r: model.init({'params': r}, imgs, meta, train=False))(jax.random.PRNGKey(0))
anchors_np = get_anchors(cfg)

def backbone(imgs):
    return model.apply(v, imgs, False, method=lambda m, im, tr: m.backbone_fpn_rpn(im, tr))

def props(imgs):
    feats, lg, pr, bb, _ = backbone(imgs)
    return feats, generate_proposals(pr, bb, jnp.asarray(anchors_np), cfg.rpn_bbox_std_dev, cfg.pre_nms_limit, 1000, 0.7)

if stage == "s2":
    f = jax.jit(lambda im: props(im)[1][0])
elif stage == "s3":
    def g(im):
        feats, (p, valid) = props(im)
        return pyramid_roi_align(feats, p, cfg.pool_size, cfg.image_shape)
    f = jax.jit(g)
elif stage == "full":
    f = jax.jit(lambda im, me: model.apply(v, im, me, train=False)["detections"])

args = (imgs, meta) if stage == "full" else (imgs,)
r = f(*args); jax.block_until_ready(r)
t0=time.perf_counter()
for _ in range(10): r = f(*args)
jax.block_until_ready(r)
print(stage, "ms/batch4:", (time.perf_counter()-t0)/10*1000)
