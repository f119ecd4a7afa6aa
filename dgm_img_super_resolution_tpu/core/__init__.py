from dgm_img_super_resolution_tpu.core.config import (  # noqa: F401
    DEFAULTS,
    Hparams,
    load_config,
    override_config,
    set_hparams,
)
