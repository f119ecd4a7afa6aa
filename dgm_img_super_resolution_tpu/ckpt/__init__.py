from dgm_img_super_resolution_tpu.ckpt.orbax_io import (  # noqa: F401
    get_all_ckpts,
    get_last_checkpoint,
    load_checkpoint,
    load_ckpt,
    save_checkpoint,
)
from dgm_img_super_resolution_tpu.ckpt.torch_import import (  # noqa: F401
    convert_srdiff_state_dict,
    export_srdiff_to_torch_keys,
    import_srdiff_checkpoint,
)
