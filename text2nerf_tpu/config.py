"""Config-file + CLI flag system.

Equivalent of the reference's configargparse setup
(/root/reference/e_opt.py:4-155 + configs/text2nerf_scenes.txt): a
``--config`` file of ``key = value`` lines merged with CLI overrides, using
only stdlib argparse (configargparse is not available on pods).  List
values use ``[a,b,c]`` syntax like the reference config file
(n_lamb_sigma/n_lamb_sh, configs/text2nerf_scenes.txt:23-24).
"""

from __future__ import annotations

import argparse
from typing import List, Optional

from .models.tensorf import TensoRFConfig
from .data.scene_state import SceneConfig
from .engine.trainer import TrainConfig
from .engine.expansion import ExpansionConfig


def _parse_value(raw: str):
    raw = raw.strip()
    if raw.startswith("[") and raw.endswith("]"):
        return [_parse_value(v) for v in raw[1:-1].split(",") if v.strip()]
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            pass
    if raw.lower() in ("true", "false"):
        return raw.lower() == "true"
    return raw


def read_config_file(path: str) -> dict:
    """Parse a ``key = value`` config file with # comments."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            key, val = line.split("=", 1)
            out[key.strip()] = _parse_value(val)
    return out


_MODEL_NAME_MAP = {"TensorVMSplit": "vm_split", "TensorCP": "cp", "TensorVM": "vm"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("text2nerf_tpu")
    p.add_argument("--config", type=str, default=None)
    # experiment
    p.add_argument("--expname", type=str, default="exp")
    p.add_argument("--basedir", type=str, default="./log")
    p.add_argument("--datadir", type=str, default="./data/scene")
    p.add_argument("--prompt", type=str, default="a cozy living room")
    p.add_argument("--weights_dir", type=str, default="weights")
    # schedule
    p.add_argument("--n_stage1", type=int, default=50)
    p.add_argument("--n_stage2", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=16384)
    p.add_argument("--seed", type=int, default=1024)
    # scene
    p.add_argument("--pose_traj", type=str, default="local_fixed")
    p.add_argument("--num_training", type=int, default=24)
    p.add_argument("--angle", type=float, default=0.2)
    p.add_argument("--trans_range", type=float, default=0.2)
    p.add_argument("--push_depth", type=float, default=2.0)
    p.add_argument("--num_sprt_poses", type=int, default=8,
                   help="accepted for CLI parity with the reference "
                   "(e_opt.py:24); support poses are the fixed 8-direction "
                   "compass set, as in the reference, which never reads it")
    p.add_argument("--dist_sprt_poses", type=float, default=0.2,
                   help="accepted for CLI parity with the reference "
                   "(e_opt.py:25); never read — trans_range controls "
                   "support-pose distance")
    p.add_argument("--regen_pose", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--use_support_set", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--hw", type=int, nargs=2, default=[512, 512])
    # lr / losses
    p.add_argument("--lr_init", type=float, default=0.02)
    p.add_argument("--lr_basis", type=float, default=1e-3)
    p.add_argument("--lr_decay_iters", type=int, default=-1)
    p.add_argument("--lr_decay_target_ratio", type=float, default=0.1)
    p.add_argument("--TV_weight_density", type=float, default=0.1)
    p.add_argument("--TV_weight_app", type=float, default=0.01)
    p.add_argument("--L1_weight_inital", type=float, default=0.0)
    p.add_argument("--Ortho_weight", type=float, default=0.0)
    # model
    p.add_argument("--model_name", type=str, default="TensorVMSplit",
                   choices=list(_MODEL_NAME_MAP))
    p.add_argument("--n_lamb_sigma", type=int, nargs="*", default=[16, 16, 16])
    p.add_argument("--n_lamb_sh", type=int, nargs="*", default=[48, 48, 48])
    p.add_argument("--data_dim_color", type=int, default=27)
    p.add_argument("--shadingMode", type=str, default="MLP_Fea_noview")
    p.add_argument("--pos_pe", type=int, default=6)
    p.add_argument("--view_pe", type=int, default=2)
    p.add_argument("--fea_pe", type=int, default=6)
    p.add_argument("--featureC", type=int, default=128)
    p.add_argument("--density_shift", type=float, default=-10.0)
    p.add_argument("--distance_scale", type=float, default=25.0)
    p.add_argument("--rm_weight_mask_thre", type=float, default=1e-4)
    p.add_argument("--alpha_mask_thre", type=float, default=1e-4)
    p.add_argument("--fea2denseAct", type=str, default="softplus")
    p.add_argument("--step_ratio", type=float, default=1.0)
    p.add_argument("--N_voxel_init", type=int, default=27_000_000)
    p.add_argument("--N_voxel_final", type=int, default=27_000_000)
    p.add_argument("--upsamp_list", type=int, nargs="*", default=[])
    p.add_argument("--update_AlphaMask_list", type=int, nargs="*", default=[])
    p.add_argument("--nSamples", type=int, default=10 ** 6)
    p.add_argument("--ndc_ray", type=int, default=0)
    p.add_argument("--app_k", type=int, default=64)
    # rendering entries
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--render_only", type=int, default=0)
    p.add_argument("--render_test", type=int, default=0)
    p.add_argument("--render_path", type=int, default=0)
    p.add_argument("--render_train", type=int, default=0)
    p.add_argument("--type_depth_loss", type=str, default="mse",
                   choices=["mse", "ssi", "silog"])
    p.add_argument("--n_stage3", type=int, default=10,
                   help="stage-3 epochs over the full ray pool "
                   "(e_opt.py; the reference hardcodes 10, "
                   "text2nerf_main.py:468)")
    p.add_argument("--N_vis", type=int, default=-1,
                   help="evaluate only N_vis equally-spaced views "
                   "(e_opt.py:138, renderer.py:83-84)")
    p.add_argument("--vis_every", type=int, default=10000,
                   help="accepted for CLI parity (e_opt.py:141); "
                   "eval cadence is epoch-based here (eval_every_epochs)")
    p.add_argument("--progress_refresh_rate", type=int, default=50,
                   help="scalar-logging cadence in steps (e_opt.py:10; "
                   "the reference's tqdm refresh rate)")
    p.add_argument("--lr_upsample_reset", type=int, default=1,
                   help="reset LR schedule after grid upsampling "
                   "(e_opt.py:66-67)")
    p.add_argument("--L1_weight_rest", type=float, default=0.0,
                   help="L1 weight after the first alpha-mask update "
                   "(e_opt.py:72-73; live only with "
                   "--update_AlphaMask_list)")
    p.add_argument("--add_timestamp", type=int, default=0,
                   help="append a timestamp to the log folder (e_opt.py:13)")
    p.add_argument("--n_iters", type=int, default=30000,
                   help="accepted for CLI parity (e_opt.py:53); training "
                   "length is epoch-based (n_stage1/2/3)")
    p.add_argument("--perturb", type=float, default=1.0,
                   help="accepted for CLI parity (e_opt.py:97); train-time "
                   "sample jitter is always on, as in the reference loop")
    p.add_argument("--accumulate_decay", type=float, default=0.998,
                   help="accepted for CLI parity (e_opt.py:98); never read "
                   "by the reference pipeline")
    p.add_argument("--white_bkgd", action="store_true", default=False,
                   help="accepted for CLI parity (e_opt.py:96); background "
                   "comes from the scene config, as in the reference")
    p.add_argument("--dibr_fill_strategy", type=str, default="filter",
                   help="accepted for CLI parity (e_opt.py:34); hole "
                   "filling follows use_filter_filling_holes")
    p.add_argument("--inpaint_method", type=str, default="sdm",
                   help="accepted for CLI parity (e_opt.py:32); SD "
                   "inpainting is the only method, as in the reference")
    p.add_argument("--inpainted_dir", type=str, default="",
                   help="accepted for CLI parity (e_opt.py:33); never read "
                   "by the reference pipeline")
    p.add_argument("--eval_compact_k", type=int, default=64,
                   help="alpha-mask sample compaction for eval renders "
                   "(0 = dense path)")
    p.add_argument("--train_density_group", type=int, default=2,
                   help="TPU-native: ray-consecutive samples per grouped "
                   "density gather/scatter row (1 = per-sample; PERF.md)")
    p.add_argument("--train_compact_k", type=int, default=64,
                   help="TPU-native: alpha-mask train compaction — once a "
                   "mask exists, gather/scatter only the first K mask-live "
                   "samples per ray (0 = dense; PERF.md round 3)")
    p.add_argument("--train_depth_cap_band", type=int, default=6,
                   help="TPU-native: depth-anchored compaction — keep the "
                   "LAST K mask-live samples at z <= depth_gt + band*step "
                   "so the window always covers the supervised surface "
                   "(0 = first-K-live; PERF.md round 4)")
    p.add_argument("--train_microbatch", type=int, default=32,
                   help="TPU-native: gradient micro-batch count inside the "
                   "jitted train step (PERF.md)")
    p.add_argument("--train_microbatch_compact", type=int, default=1,
                   help="TPU-native: micro-batch count for the COMPACTED "
                   "step specialization (mask present) — compaction "
                   "shrinks temps ~4x, so R=1 is fastest at the "
                   "production config (PERF.md round 4); 0 = use "
                   "--train_microbatch")
    p.add_argument("--train_compute_dtype", type=str, default="fp32",
                   choices=("fp32", "bf16"),
                   help="feature gather/lerp dtype in the train step "
                   "(bf16 measured slower on v5e; PERF.md)")
    p.add_argument("--export_mesh", type=int, default=0)
    p.add_argument("--resume", type=int, default=0,
                   help="resume a crashed run from the last stage boundary")
    p.add_argument("--resume_every_epochs", type=int, default=0,
                   help="additionally checkpoint every N epochs so long "
                   "stages survive interruptions (0 = boundaries only)")
    # expansion
    p.add_argument("--frame_select_type", type=str, default="auto_cos")
    p.add_argument("--use_filter_filling_holes",
                   action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--use_rendered_img_to_warp",
                   action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--update_known_views", action="store_true", default=False)
    return p


def parse_args(argv: Optional[List[str]] = None):
    """Parse CLI + optional config file (file values are defaults; CLI wins)."""
    parser = build_parser()
    args, _ = parser.parse_known_args(argv)
    if args.config:
        file_vals = read_config_file(args.config)
        known = {a.dest for a in parser._actions}
        parser.set_defaults(**{k: v for k, v in file_vals.items() if k in known})
        args = parser.parse_args(argv)
    return args


def to_configs(args):
    """argparse Namespace → (TrainConfig, SceneConfig, ExpansionConfig)."""
    model = TensoRFConfig(
        model_name=_MODEL_NAME_MAP[args.model_name],
        density_n_comp=tuple(args.n_lamb_sigma),
        app_n_comp=tuple(args.n_lamb_sh),
        app_dim=args.data_dim_color,
        shading_mode=args.shadingMode,
        pos_pe=args.pos_pe, view_pe=args.view_pe, fea_pe=args.fea_pe,
        feature_c=args.featureC,
        density_shift=args.density_shift,
        distance_scale=args.distance_scale,
        raymarch_weight_thres=args.rm_weight_mask_thre,
        alpha_mask_thres=args.alpha_mask_thre,
        fea2dense=args.fea2denseAct,
        step_ratio=args.step_ratio,
    )
    train = TrainConfig(
        expname=args.expname, basedir=args.basedir,
        n_stage1=args.n_stage1, n_stage2=args.n_stage2,
        batch_size=args.batch_size,
        lr_init=args.lr_init, lr_basis=args.lr_basis,
        lr_decay_iters=args.lr_decay_iters,
        lr_decay_target_ratio=args.lr_decay_target_ratio,
        tv_weight_density=args.TV_weight_density,
        tv_weight_app=args.TV_weight_app,
        l1_weight=args.L1_weight_inital,
        ortho_weight=args.Ortho_weight,
        resume=bool(args.resume),
        n_voxel_init=args.N_voxel_init,
        n_voxel_final=args.N_voxel_final,
        upsamp_list=tuple(args.upsamp_list),
        update_alphamask_list=tuple(args.update_AlphaMask_list),
        n_samples_cap=args.nSamples,
        app_k=args.app_k, ndc_ray=bool(args.ndc_ray),
        ckpt=args.ckpt,
        render_test=bool(args.render_test), render_path=bool(args.render_path),
        render_train=bool(args.render_train),
        depth_loss_type=args.type_depth_loss,
        eval_compact_k=args.eval_compact_k,
        n_stage3=args.n_stage3,
        n_vis=args.N_vis,
        progress_refresh_rate=args.progress_refresh_rate,
        lr_upsample_reset=bool(args.lr_upsample_reset),
        l1_weight_rest=args.L1_weight_rest,
        add_timestamp=bool(args.add_timestamp),
        train_density_group=args.train_density_group,
        train_compact_k=args.train_compact_k,
        train_depth_cap_band=args.train_depth_cap_band,
        train_microbatch=args.train_microbatch,
        train_microbatch_compact=args.train_microbatch_compact,
        train_compute_dtype=args.train_compute_dtype,
        resume_every_epochs=args.resume_every_epochs,
        seed=args.seed, model=model,
    )
    scene = SceneConfig(
        datadir=args.datadir, prompt=args.prompt,
        pose_traj=args.pose_traj, num_training=args.num_training,
        angle=args.angle, trans_range=args.trans_range,
        push_depth=args.push_depth, hw=tuple(args.hw),
        use_support_set=args.use_support_set, regen_pose=args.regen_pose,
    )
    expansion = ExpansionConfig(
        prompt=args.prompt, push_depth=args.push_depth,
        trans_range=args.trans_range,
        use_support_set=args.use_support_set,
        update_known_views=args.update_known_views,
        use_filter_filling_holes=args.use_filter_filling_holes,
        use_rendered_img_to_warp=args.use_rendered_img_to_warp,
        frame_select_type=args.frame_select_type,
        chunk=args.batch_size, app_k=args.app_k,
    )
    return train, scene, expansion
