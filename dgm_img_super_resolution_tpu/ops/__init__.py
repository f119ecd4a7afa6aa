from dgm_img_super_resolution_tpu.ops.resize import (  # noqa: F401
    imresize,
    nearest_upsample,
    resize,
    resize_matrix,
)
from dgm_img_super_resolution_tpu.ops.image import (  # noqa: F401
    ImgMerger,
    extract_patches,
    merge_patches,
    normalize_to_pm1,
    pm1_to_uint8,
    uint8_to_pm1,
)
