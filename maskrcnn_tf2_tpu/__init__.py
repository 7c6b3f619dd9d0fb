"""maskrcnn_tf2_tpu — a TPU-native instance-segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the TF2 Mask-RCNN
reference (``maskrcnn_tf2``): multi-backbone FPN Mask-RCNN with RPN, proposal
NMS, pyramid ROIAlign, box/class/mask heads, the 5-loss training objective,
device-side data preprocessing, data-parallel training over a device mesh,
and a fixed-shape batched inference/export path.
"""

__version__ = "0.1.0"

from maskrcnn_tf2_tpu.config import MaskRCNNConfig, coco_config  # noqa: F401
