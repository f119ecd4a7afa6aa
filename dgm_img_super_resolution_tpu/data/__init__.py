from dgm_img_super_resolution_tpu.data.loader import DataLoader  # noqa: F401
from dgm_img_super_resolution_tpu.data.div2k import DIV2KDataset  # noqa: F401
from dgm_img_super_resolution_tpu.data.mnist import load_mnist, synthetic_mnist  # noqa: F401
