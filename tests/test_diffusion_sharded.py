"""Candidate-batch sharding: the denoise loop runs data-parallel over the
virtual 8-device CPU mesh."""

import numpy as np
import jax


def test_candidate_batch_shards_over_devices():
    assert jax.device_count() >= 8  # conftest forces 8 virtual CPU devices
    from text2nerf_tpu.services.diffusion_service import DiffusionPipeline

    pipe = DiffusionPipeline("", inpaint=False, hw=(32, 32), tiny=True,
                             num_steps=2)
    imgs = pipe.generate("sharded prompt", num_images=8, seed=0)
    assert len(imgs) == 8
    for img in imgs:
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()
    # per-candidate RNG differs
    assert not np.allclose(imgs[0], imgs[1])
