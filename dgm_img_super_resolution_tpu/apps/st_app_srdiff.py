"""Streamlit app: SRDiff super-resolution (the reference's ``st_app1.py``).

Same UI surface as reference ``st_app1.py:1691-1720`` — uploader → Enhance
button → side-by-side render → PNG download — but backed by the *full* model
stack on TPU (the reference app substitutes single-conv placeholder networks,
``st_app1.py:1606-1628``; SURVEY.md flags that as a defect not to replicate).

Run: ``streamlit run dgm_img_super_resolution_tpu/apps/st_app_srdiff.py``
"""

from __future__ import annotations

import io
import os

import numpy as np
from PIL import Image


def main() -> None:
    import streamlit as st

    from dgm_img_super_resolution_tpu.core.config import Hparams, set_hparams
    from dgm_img_super_resolution_tpu.inference import SRDiffPipeline

    st.title("SRDiff ×4 Super-Resolution (TPU)")
    st.caption("Conditional residual diffusion — full RRDB + UNet on TPU, 100-step sampler in one compiled scan")

    @st.cache_resource
    def load_pipeline() -> SRDiffPipeline:
        config = os.environ.get("SRDIFF_CONFIG", "")
        ckpt = os.environ.get("SRDIFF_CKPT", "srdiff/model_ckpt_steps_400000.ckpt")
        hp = set_hparams(config) if config else Hparams(compute_dtype="bfloat16")
        return SRDiffPipeline(hp, ckpt_path=ckpt if os.path.exists(ckpt) else None)

    pipe = load_pipeline()

    uploaded = st.file_uploader("Upload a low-resolution image", type=["png", "jpg", "jpeg"])
    if uploaded is not None:
        image = Image.open(uploaded).convert("RGB")
        col1, col2 = st.columns(2)
        col1.image(image, caption=f"Input {image.size[0]}×{image.size[1]}")
        if st.button("Enhance Image"):
            with st.spinner("Sampling on TPU…"):
                lr = np.asarray(image)
                # per-step sampler progress (the reference's sample_tqdm
                # surface, model.py:1076-1078) as a progress bar; segments
                # of 10 steps keep device dispatches large
                bar = st.progress(0.0)
                cb = lambda done, total: bar.progress(done / total)  # noqa: E731
                if max(lr.shape[:2]) > 128:
                    sr = pipe.upscale_large(lr, patch=64, progress_cb=cb, callback_steps=10)
                else:
                    sr = pipe.upscale(lr, progress_cb=cb, callback_steps=10)
                bar.empty()
                sr_u8 = (np.clip(sr, 0, 1) * 255).round().astype(np.uint8)
            col2.image(sr_u8, caption=f"Enhanced {sr_u8.shape[1]}×{sr_u8.shape[0]}")
            buf = io.BytesIO()
            Image.fromarray(sr_u8).save(buf, format="PNG")
            st.download_button(
                "Download enhanced image",
                data=buf.getvalue(),
                file_name="enhanced.png",
                mime="image/png",
            )


if __name__ == "__main__":
    main()
