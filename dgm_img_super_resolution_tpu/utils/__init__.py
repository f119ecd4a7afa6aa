from dgm_img_super_resolution_tpu.utils.misc import (  # noqa: F401
    cycle,
    make_run_dir,
    num_to_groups,
    set_seed,
    plot_img,
    reduce_metrics,
    tensors_to_np,
    tensors_to_scalars,
    to_device,
    to_host,
)
from dgm_img_super_resolution_tpu.utils.profiling import StepTimer, trace_annotation, profile_to  # noqa: F401
