"""Config system tests: file parsing, CLI override, dataclass mapping."""

import os

from text2nerf_tpu import config as C


def test_config_file_parsing(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text(
        """
# comment
expname = myexp
batch_size = 4096
step_ratio = 1.0
n_lamb_sigma = [16,16,16]
n_lamb_sh = [48,48,48]
model_name = TensorVMSplit
shadingMode = MLP_Fea_noview
TV_weight_density = 0.1
render_test = 1
"""
    )
    vals = C.read_config_file(str(p))
    assert vals["expname"] == "myexp"
    assert vals["batch_size"] == 4096
    assert vals["n_lamb_sigma"] == [16, 16, 16]
    assert vals["TV_weight_density"] == 0.1


def test_cli_overrides_config_file(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text("batch_size = 4096\nexpname = fromfile\n")
    args = C.parse_args(["--config", str(p), "--batch_size", "1024"])
    assert args.batch_size == 1024     # CLI wins
    assert args.expname == "fromfile"  # file default survives


def test_to_configs_mapping():
    args = C.parse_args(
        ["--model_name", "TensorCP", "--n_lamb_sigma", "96",
         "--n_lamb_sh", "288", "--prompt", "a test"]
    )
    train, scene, expansion = C.to_configs(args)
    assert train.model.model_name == "cp"
    assert train.model.density_n_comp == (96,)
    assert scene.prompt == "a test"
    assert expansion.prompt == "a test"
    # reference defaults present
    assert train.model.distance_scale == 25.0
    assert train.model.density_shift == -10.0
    assert train.lr_init == 0.02 and train.lr_basis == 1e-3


def test_reference_config_file_parses():
    """Our parser must accept the reference's shipped config format."""
    ref = "/root/reference/configs/text2nerf_scenes.txt"
    if not os.path.exists(ref):
        return
    vals = C.read_config_file(ref)
    assert vals["model_name"] == "TensorVMSplit"
    assert vals["n_lamb_sigma"] == [16, 16, 16]
    assert vals["shadingMode"] == "MLP_Fea_noview"
    assert vals["step_ratio"] == 1.0


def test_full_reference_flag_surface():
    """Every flag the reference CLI accepts (e_opt.py:4-155) parses here;
    the live ones land in the dataclasses."""
    from text2nerf_tpu import config as C

    p = C.build_parser()
    args = p.parse_args([
        "--datadir", "d", "--prompt", "x",
        "--n_stage3", "7", "--N_vis", "5", "--progress_refresh_rate", "25",
        "--lr_upsample_reset", "0", "--L1_weight_rest", "1e-5",
        "--add_timestamp", "0", "--n_iters", "30000", "--perturb", "1.0",
        "--accumulate_decay", "0.998", "--white_bkgd",
        "--dibr_fill_strategy", "filter", "--inpaint_method", "sdm",
        "--inpainted_dir", "", "--vis_every", "5000",
    ])
    train, scene, exp = C.to_configs(args)
    assert train.n_stage3 == 7
    assert train.n_vis == 5
    assert train.progress_refresh_rate == 25
    assert train.lr_upsample_reset is False
    assert train.l1_weight_rest == 1e-5


def test_persistent_compilation_cache_helper(tmp_path, monkeypatch):
    """CLI entry points amortize jit compiles across runs via a
    persistent on-disk cache (utils/compilation_cache.py)."""
    import jax

    from text2nerf_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    prev = jax.config.jax_compilation_cache_dir
    try:
        p = enable_persistent_compilation_cache(str(tmp_path / "c"))
        assert jax.config.jax_compilation_cache_dir == p
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "e"))
        assert enable_persistent_compilation_cache() == str(tmp_path / "e")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
