"""Model summary: parameter counts (the reference prints trainable /
non-trainable totals at build, model.py:582-585)."""

from __future__ import annotations

import jax
import numpy as np


def count_params(tree) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)))


def summarize(variables, per_module: bool = True) -> str:
    lines = []
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    total = count_params(params)
    if per_module and isinstance(params, dict):
        for name in sorted(params):
            lines.append(f"  {name:20s} {count_params(params[name]):>12,d}")
    lines.append(f"Total params:        {total:>12,d}")
    lines.append(f"BatchNorm stats:     {count_params(stats):>12,d}")
    return "\n".join(lines)
