"""End-to-end tiny diffusion pipeline: text2img + inpainting plumbing."""

import numpy as np

from text2nerf_tpu.services.diffusion_service import DiffusionPipeline


def test_tiny_text2img_pipeline():
    pipe = DiffusionPipeline("", inpaint=False, hw=(32, 32), tiny=True,
                             num_steps=4)
    imgs = pipe.generate("a test prompt", num_images=2, seed=1)
    assert len(imgs) == 2
    for img in imgs:
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()
        assert img.min() >= 0.0 and img.max() <= 1.0
    # different prompts → different outputs (conditioning is wired through)
    other = pipe.generate("another prompt entirely", num_images=2, seed=1)
    assert not np.allclose(imgs[0], other[0])


def test_tiny_inpaint_pipeline():
    pipe = DiffusionPipeline("", inpaint=True, hw=(32, 32), tiny=True,
                             num_steps=4)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    outs = pipe.generate(
        "fill the hole", num_images=2, seed=3, init_image=img, mask_holes=mask
    )
    assert len(outs) == 2 and outs[0].shape == (32, 32, 3)
    assert np.isfinite(outs[0]).all()
