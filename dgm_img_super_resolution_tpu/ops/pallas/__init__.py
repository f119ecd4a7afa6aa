from dgm_img_super_resolution_tpu.ops.pallas.attention import flash_attention  # noqa: F401
from dgm_img_super_resolution_tpu.ops.pallas.groupnorm import fused_group_norm  # noqa: F401
