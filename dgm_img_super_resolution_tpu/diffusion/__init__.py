from dgm_img_super_resolution_tpu.diffusion.schedule import (  # noqa: F401
    Schedule,
    cosine_beta_schedule,
    get_beta_schedule,
    make_schedule,
)
from dgm_img_super_resolution_tpu.diffusion.gaussian import (  # noqa: F401
    GaussianDiffusion,
    noise_like,
)
