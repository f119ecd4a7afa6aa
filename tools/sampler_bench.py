import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.inference import SRDiffPipeline
from dgm_img_super_resolution_tpu.ops.resize import resize

hp = Hparams(compute_dtype="bfloat16")
pipe = SRDiffPipeline(hp)
B, LR = 8, 128
x = jnp.asarray(np.random.rand(B, LR, LR, 3).astype(np.float32) * 2 - 1)
rng = jax.random.PRNGKey(0)
diff = pipe.diffusion

@jax.jit
def full(params, img_lr, r):
    img_lr_up = resize(img_lr, (LR*4, LR*4), variant="torch")
    img, _ = diff.sample(params, img_lr, img_lr_up, r)
    return jnp.sum(img.astype(jnp.float32))

v = float(full(pipe.params, x, rng))
for i in range(3):
    t0 = time.perf_counter()
    v = float(full(pipe.params, x, jax.random.PRNGKey(i)))
    print(f"sampler-only: {time.perf_counter()-t0:.2f}s")

@jax.jit
def rrdb_only(params, img_lr, img_lr_up):
    cond, rrdb_out = diff.rrdb_cond(params, img_lr, img_lr_up)
    return jnp.sum(cond.astype(jnp.float32))

up = resize(x, (LR*4, LR*4), variant="torch")
v = float(rrdb_only(pipe.params, x, up))
t0 = time.perf_counter(); v = float(rrdb_only(pipe.params, x, up)); print(f"rrdb_cond: {time.perf_counter()-t0:.3f}s")
