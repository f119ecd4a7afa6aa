from dgm_img_super_resolution_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    replicate,
    shard_batch,
)
