"""binned_top_k: recall vs exact lax.top_k, ordering, and edge cases."""

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tf2_tpu.ops.topk import binned_top_k


def _recall(approx_idx, exact_idx):
    return len(set(np.asarray(approx_idx).tolist()) & set(np.asarray(exact_idx).tolist())) / len(exact_idx)


def test_recall_random_scores_proposal_scale():
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.rand(261888).astype(np.float32))
    k = 6000
    v, i = jax.jit(lambda s: binned_top_k(s, k))(scores)
    _, exact_i = jax.lax.top_k(scores, k)
    assert _recall(i, exact_i) >= 0.995
    # returned values descending and consistent with returned indices
    v = np.asarray(v)
    assert (np.diff(v) <= 0).all()
    np.testing.assert_array_equal(v, np.asarray(scores)[np.asarray(i)])


def test_exact_on_contiguous_cluster():
    # Adversarial for *block* binning, trivial for stride binning: the true
    # top-k are one contiguous run (spatially clustered anchors), which the
    # stride layout spreads across k distinct bins.
    n, k = 1 << 18, 4000
    scores = np.zeros(n, np.float32)
    scores[100_000:100_000 + k] = 1.0 + np.arange(k, dtype=np.float32) / k
    v, i = binned_top_k(jnp.asarray(scores), k)
    assert _recall(i, np.arange(100_000, 100_000 + k)) == 1.0


def test_small_input_falls_back_to_exact():
    rng = np.random.RandomState(1)
    scores = jnp.asarray(rng.randn(512).astype(np.float32))
    v, i = binned_top_k(scores, 100)
    ev, ei = jax.lax.top_k(scores, 100)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ev))


def test_duplicate_scores_return_distinct_indices():
    scores = jnp.asarray(np.ones(1 << 16, np.float32))
    k = 2048
    _, i = binned_top_k(scores, k)
    assert len(set(np.asarray(i).tolist())) == k
