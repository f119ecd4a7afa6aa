from dgm_img_super_resolution_tpu.models.sd.unet import UNet2DCondition  # noqa: F401
from dgm_img_super_resolution_tpu.models.sd.vae import AutoencoderKL  # noqa: F401
from dgm_img_super_resolution_tpu.models.sd.clip import CLIPTextEncoder, SimpleTokenizer  # noqa: F401
from dgm_img_super_resolution_tpu.models.sd.pipeline import StableDiffusionUpscalePipeline  # noqa: F401
