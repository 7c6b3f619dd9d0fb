"""Pure-functional geometry / detection ops (the jnp heart of the framework)."""

from maskrcnn_tf2_tpu.ops import anchors, boxes, detection, image, nms, proposal, roi_align, targets  # noqa: F401
