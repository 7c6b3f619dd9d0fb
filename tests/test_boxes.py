import numpy as np
import jax.numpy as jnp

from maskrcnn_tf2_tpu.ops import boxes as B


def random_boxes(rng, n, scale=1.0):
    y1 = rng.uniform(0, 0.8, n)
    x1 = rng.uniform(0, 0.8, n)
    h = rng.uniform(0.05, 0.2, n)
    w = rng.uniform(0.05, 0.2, n)
    return (np.stack([y1, x1, y1 + h, x1 + w], axis=1) * scale).astype(np.float32)


def test_norm_denorm_roundtrip(rng):
    bx = random_boxes(rng, 32, scale=512.0)
    normed = B.norm_boxes(jnp.asarray(bx), (512, 512))
    back = B.denorm_boxes(normed, (512, 512))
    np.testing.assert_allclose(np.asarray(back), bx, rtol=1e-5, atol=1e-3)
    # full-image box maps to [0,0,1,1]
    full = B.norm_boxes(jnp.asarray([[0.0, 0.0, 512.0, 512.0]]), (512, 512))
    np.testing.assert_allclose(np.asarray(full), [[0, 0, 1, 1]], atol=1e-6)


def test_encode_apply_inverse(rng):
    anchors = random_boxes(rng, 64)
    gt = random_boxes(rng, 64)
    deltas = B.encode_boxes(jnp.asarray(anchors), jnp.asarray(gt))
    rec = B.apply_box_deltas(jnp.asarray(anchors), deltas)
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-5)


def test_apply_deltas_manual():
    box = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    deltas = jnp.asarray([[0.5, -0.5, np.log(2.0), np.log(0.5)]])
    out = np.asarray(B.apply_box_deltas(box, deltas))[0]
    # center (1,1) -> (2,0); h 2->4, w 2->1
    np.testing.assert_allclose(out, [0.0, -0.5, 4.0, 0.5], atol=1e-5)


def test_overlaps_vs_oracle(rng):
    b1 = random_boxes(rng, 23)
    b2 = random_boxes(rng, 17)
    got = np.asarray(B.overlaps(jnp.asarray(b1), jnp.asarray(b2)))

    def iou(a, b):
        yy1, xx1 = max(a[0], b[0]), max(a[1], b[1])
        yy2, xx2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(yy2 - yy1, 0) * max(xx2 - xx1, 0)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua if ua > 0 else 0.0

    want = np.array([[iou(a, b) for b in b2] for a in b1])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_clip_boxes():
    bx = jnp.asarray([[-0.5, 0.2, 0.5, 1.5], [0.1, 0.1, 0.4, 0.4]])
    out = np.asarray(B.clip_boxes(bx, jnp.asarray([0.0, 0.0, 1.0, 1.0])))
    np.testing.assert_allclose(out, [[0.0, 0.2, 0.5, 1.0], [0.1, 0.1, 0.4, 0.4]])
    # per-image window broadcast [B, 1, 4] over [B, N, 4]
    batched = jnp.stack([bx, bx])
    windows = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.0, 0.3, 0.3, 0.9]])
    out2 = np.asarray(B.clip_boxes(batched, windows[:, None, :]))
    np.testing.assert_allclose(out2[0], out)
    np.testing.assert_allclose(out2[1, 0], [0.0, 0.3, 0.3, 0.9])


def test_extract_bboxes_from_masks():
    masks = np.zeros((3, 16, 16), np.float32)
    masks[0, 2:5, 3:9] = 1  # box (2,3,5,9)
    masks[1, 0, 15] = 1  # single pixel -> (0,15,1,16)
    got = np.asarray(B.extract_bboxes_from_masks(jnp.asarray(masks)))
    np.testing.assert_allclose(got[0], [2, 3, 5, 9])
    np.testing.assert_allclose(got[1], [0, 15, 1, 16])
    np.testing.assert_allclose(got[2], [0, 0, 0, 0])  # empty mask
