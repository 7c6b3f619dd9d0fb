from maskrcnn_tf2_tpu.models.backbones.factory import backbone_names, get_backbone  # noqa: F401
