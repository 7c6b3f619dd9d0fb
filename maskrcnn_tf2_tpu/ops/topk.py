"""Stride-binned approximate top-k for large score vectors on TPU.

Motivation: the reference ``ProposalLayer`` takes ``tf.nn.top_k`` of all
~262k anchor scores (mrcnn_layers.py:232-239). On TPU, ``lax.top_k`` lowers
to a full O(N log N) sort (5.3 ms at b16/1024px on v5e), and
``lax.approx_max_k`` silently falls back to the same full sort when the
PartialReduce output size exceeds N — which it does for k=6000 @ recall 0.99
(the profiled HLO was ``sort(f32[16,261888])``).

This op is the two-stage reduction ``approx_max_k`` *intended*:

1. view scores as ``[m, L]`` where element ``(r, c)`` is index ``r*L + c`` —
   a bin is a *stride-L* residue class, so spatially-adjacent anchors (which
   have correlated scores) land in *different* bins, keeping collisions of
   top-k entries rare;
2. take the top ``per_bin`` entries of each bin by ``per_bin`` rounds of
   (argmax over the m-axis, mask the winner) — pure vector ops, no sort;
3. exact ``lax.top_k`` over the ``L * per_bin`` surviving candidates
   (~8x fewer elements than the input at proposal scale).

Expected misses are bins holding more than ``per_bin`` true top-k entries:
for k=6000, L=8192, per_bin=4 that is ~8 entries (recall ~0.9987), all at
the low-score boundary where NMS keeps none.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def binned_top_k(scores: jnp.ndarray, k: int, per_bin: int = 4):
    """Approximate top-k of a 1-D score vector (descending).

    Args:
      scores: ``[N]`` float scores.
      k: number of entries to return.
      per_bin: candidates kept per bin (recall knob; 4 gives ~0.999 at
        proposal scale).

    Returns:
      ``(values [k], indices [k] int32)`` — descending, approximately the
      top-k. Falls back to exact ``lax.top_k`` when the input is too small
      for the reduction to help.
    """
    n = scores.shape[0]
    num_bins = _next_pow2(max(k, n // 32))
    if n <= 2 * num_bins * per_bin or num_bins * per_bin < k:
        return jax.lax.top_k(scores, k)

    scores = scores.astype(jnp.float32)
    m = -(-n // num_bins)
    pad = m * num_bins - n
    if pad:
        scores = jnp.concatenate([scores, jnp.full((pad,), _NEG_INF, jnp.float32)])
    view = scores.reshape(m, num_bins)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (m, num_bins), 0)
    col = jnp.arange(num_bins, dtype=jnp.int32)
    vals, idxs = [], []
    cur = view
    for _ in range(per_bin):
        amax = jnp.argmax(cur, axis=0).astype(jnp.int32)  # [L]
        vals.append(jnp.max(cur, axis=0))
        idxs.append(amax * num_bins + col)
        cur = jnp.where(row_iota == amax[None, :], _NEG_INF, cur)

    cand_v = jnp.concatenate(vals)  # [L * per_bin]
    cand_i = jnp.concatenate(idxs)
    top_v, pos = jax.lax.top_k(cand_v, k)
    top_i = jnp.take(cand_i, pos)
    return top_v, jnp.clip(top_i, 0, n - 1).astype(jnp.int32)
