from maskrcnn_tf2_tpu.models.mask_rcnn import MaskRCNN  # noqa: F401
from maskrcnn_tf2_tpu.models.backbones.factory import backbone_names, get_backbone  # noqa: F401
