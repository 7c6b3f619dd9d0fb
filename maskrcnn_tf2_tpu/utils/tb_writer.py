"""TensorBoard scalar writer (optional; reference uses the Keras TensorBoard
callback, training.py:131-134). Gated on tensorflow availability — pass the
returned callable as ``metric_writer`` to ``train_model``."""

from __future__ import annotations

from typing import Callable, Dict, Optional


def make_tb_writer(logdir: str) -> Optional[Callable[[int, Dict[str, float]], None]]:
    try:
        import tensorflow as tf
    except ImportError:
        return None
    writer = tf.summary.create_file_writer(logdir)

    def write(step: int, metrics: Dict[str, float]):
        with writer.as_default():
            for k, v in metrics.items():
                tf.summary.scalar(k, v, step=step)
        writer.flush()

    return write
