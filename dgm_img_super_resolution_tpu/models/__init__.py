from dgm_img_super_resolution_tpu.models.layers import (  # noqa: F401
    Block,
    ConvTranspose2dTorch,
    Downsample,
    LinearAttention,
    Mish,
    ResnetBlock,
    Rezero,
    Upsample,
    mish,
    sinusoidal_pos_emb,
)
from dgm_img_super_resolution_tpu.models.rrdb import RRDB, RRDBNet, ResidualDenseBlock5C  # noqa: F401
from dgm_img_super_resolution_tpu.models.unet import Unet  # noqa: F401
from dgm_img_super_resolution_tpu.models.param_transforms import (  # noqa: F401
    kaiming_init,
    wn_merge,
    wn_split,
)
