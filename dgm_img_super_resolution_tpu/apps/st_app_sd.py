"""Streamlit app: Stable Diffusion ×4 upscaler (the reference's ``st_app2.py``).

Same surface as reference ``st_app2.py:29-77`` — uploader, optional prompt,
per-step progress bar (``st_app2.py:52-67``), side-by-side result — with the
pipeline running natively on TPU instead of through ``diffusers``.

Run: ``streamlit run dgm_img_super_resolution_tpu/apps/st_app_sd.py``
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

LOW_RES_SIZE = 128  # reference st_app2.py:34


def main() -> None:
    import streamlit as st

    from dgm_img_super_resolution_tpu.models.sd import StableDiffusionUpscalePipeline

    st.title("Stable Diffusion ×4 Upscaler (TPU)")

    @st.cache_resource
    def load_pipeline() -> StableDiffusionUpscalePipeline:
        ckpt_dir = os.environ.get("SD_X4_CKPT_DIR", "")
        if ckpt_dir and os.path.isdir(ckpt_dir):
            from dgm_img_super_resolution_tpu.ckpt.sd_import import load_sd_x4_pipeline

            return load_sd_x4_pipeline(ckpt_dir)
        st.warning("No SD_X4_CKPT_DIR set — running with random weights (demo mode).")
        return StableDiffusionUpscalePipeline()

    pipe = load_pipeline()
    uploaded = st.file_uploader("Upload an image", type=["png", "jpg", "jpeg"])
    prompt = st.text_input("Optional text prompt", value="")

    if uploaded is not None:
        image = Image.open(uploaded).convert("RGB").resize((LOW_RES_SIZE, LOW_RES_SIZE))
        col1, col2 = st.columns(2)
        col1.image(image, caption=f"Input {LOW_RES_SIZE}×{LOW_RES_SIZE}")
        if st.button("Upscale"):
            progress = st.progress(0)
            num_steps = 20  # reference st_app2.py:53

            def progress_callback(step, timestep, latents):
                progress.progress(min((step + 1) / num_steps, 1.0))

            with st.spinner("Denoising on TPU…"):
                out = pipe(
                    prompt or "",
                    np.asarray(image),
                    num_inference_steps=num_steps,
                    callback=progress_callback,
                    callback_steps=1,
                )
            sr = (np.clip(out[0], 0, 1) * 255).round().astype(np.uint8)
            col2.image(sr, caption=f"Upscaled {sr.shape[1]}×{sr.shape[0]}")


if __name__ == "__main__":
    main()
