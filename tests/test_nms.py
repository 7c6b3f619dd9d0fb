import numpy as np
import jax.numpy as jnp

from maskrcnn_tf2_tpu.ops.nms import non_max_suppression, nms_padded_boxes


def nms_oracle(boxes, scores, iou_t, max_out):
    """Sequential greedy NMS (the semantics of tf.image.non_max_suppression)."""
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) == max_out:
            break
        bi = boxes[i]
        for j in order:
            if suppressed[j] or j == i:
                continue
            yy1, xx1 = max(bi[0], boxes[j][0]), max(bi[1], boxes[j][1])
            yy2, xx2 = min(bi[2], boxes[j][2]), min(bi[3], boxes[j][3])
            inter = max(yy2 - yy1, 0) * max(xx2 - xx1, 0)
            ua = (
                (bi[2] - bi[0]) * (bi[3] - bi[1])
                + (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
                - inter
            )
            iou = inter / ua if ua > 0 else 0.0
            if iou > iou_t and scores[j] < scores[i]:
                suppressed[j] = True
    return keep


def random_boxes_scores(rs, n):
    y1 = rs.uniform(0, 0.8, n)
    x1 = rs.uniform(0, 0.8, n)
    h = rs.uniform(0.02, 0.3, n)
    w = rs.uniform(0.02, 0.3, n)
    boxes = np.stack([y1, x1, y1 + h, x1 + w], axis=1).astype(np.float32)
    # distinct scores to avoid tie-order ambiguity between sort impls
    scores = rs.permutation(n).astype(np.float32) / n + 0.001
    return boxes, scores


def test_nms_matches_sequential_oracle():
    for seed in range(5):
        rs = np.random.RandomState(seed)
        boxes, scores = random_boxes_scores(rs, 200)
        for iou_t in (0.3, 0.5, 0.7):
            want = nms_oracle(boxes, scores, iou_t, 50)
            idx, valid = non_max_suppression(
                jnp.asarray(boxes), jnp.asarray(scores), 50, iou_t
            )
            got = list(np.asarray(idx)[np.asarray(valid)])
            assert got == want, f"seed={seed} iou={iou_t}"


def test_nms_dense_overlap_chain():
    # Ladder of heavily-overlapping boxes: deep suppression chains.
    n = 100
    y1 = np.linspace(0, 1.0, n)
    boxes = np.stack([y1, np.zeros(n), y1 + 0.5, np.ones(n)], axis=1).astype(
        np.float32
    )
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    want = nms_oracle(boxes, scores, 0.5, n)
    idx, valid = non_max_suppression(jnp.asarray(boxes), jnp.asarray(scores), n, 0.5)
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == want


def test_nms_respects_valid_mask_and_padding():
    rs = np.random.RandomState(7)
    boxes, scores = random_boxes_scores(rs, 64)
    valid = np.arange(64) < 40
    idx, out_valid = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), 64, 0.5, jnp.asarray(valid)
    )
    kept = np.asarray(idx)[np.asarray(out_valid)]
    assert kept.max() < 40
    want = nms_oracle(boxes[:40], scores[:40], 0.5, 64)
    assert list(kept) == want


def test_nms_padded_boxes_zero_pad():
    boxes = np.array(
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    out_boxes, out_scores, out_valid = nms_padded_boxes(
        jnp.asarray(boxes), jnp.asarray(scores), 4, 0.5
    )
    assert list(np.asarray(out_valid)) == [True, True, False, False]
    np.testing.assert_allclose(np.asarray(out_boxes)[0], [0, 0, 1, 1])
    np.testing.assert_allclose(np.asarray(out_boxes)[1], [2, 2, 3, 3])
    np.testing.assert_allclose(np.asarray(out_boxes)[2:], 0.0)
    np.testing.assert_allclose(np.asarray(out_scores), [0.9, 0.7, 0.0, 0.0])


def test_nms_presorted_matches_unsorted():
    """presorted=True on score-descending input == the general path.

    The ProposalLayer feeds lax.top_k output (already descending) into NMS;
    the presorted fast path must keep identical semantics, including ties
    and the trailing-invalid interleave.
    """
    rs = np.random.RandomState(11)
    boxes, scores = random_boxes_scores(rs, 200)
    scores = np.round(scores, 2)  # force some exact ties
    order = np.argsort(-scores, kind="stable")
    boxes_s, scores_s = boxes[order], scores[order]
    for m in (50, 200):
        idx_ref, val_ref = non_max_suppression(
            jnp.asarray(boxes_s), jnp.asarray(scores_s), m, 0.5
        )
        idx_fast, val_fast = non_max_suppression(
            jnp.asarray(boxes_s), jnp.asarray(scores_s), m, 0.5, presorted=True
        )
        np.testing.assert_array_equal(np.asarray(val_ref), np.asarray(val_fast))
        np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_fast))


def test_nms_presorted_with_valid_mask():
    rs = np.random.RandomState(13)
    boxes, scores = random_boxes_scores(rs, 96)
    order = np.argsort(-scores, kind="stable")
    boxes_s, scores_s = boxes[order], scores[order]
    valid = np.ones(96, bool)
    valid[10] = valid[40] = False  # interleaved invalid rows stay excluded
    idx, out_valid = non_max_suppression(
        jnp.asarray(boxes_s),
        jnp.asarray(scores_s),
        96,
        0.5,
        jnp.asarray(valid),
        presorted=True,
    )
    kept = np.asarray(idx)[np.asarray(out_valid)]
    assert 10 not in kept and 40 not in kept
    want = nms_oracle(
        boxes_s[valid], scores_s[valid], 0.5, 96
    )
    remap = np.flatnonzero(valid)
    assert list(kept) == [remap[i] for i in want]
