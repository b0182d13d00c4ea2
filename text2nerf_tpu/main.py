"""CLI entry point: ``python -m text2nerf_tpu.main --prompt ... [flags]``.

Equivalent of the reference __main__ (text2nerf_main.py:653-672): parses
config + flags, applies the production overrides (use_support_set on,
update_known_views off, 300^3 grid, batch 16384 — :657-665), then runs
either render-only or full reconstruction.
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
    from . import config as cfg_mod
    from .engine import trainer
    from .services.registry import default_services
    from .utils.compilation_cache import enable_persistent_compilation_cache
    from .utils.seeding import set_seed

    enable_persistent_compilation_cache()
    args = cfg_mod.parse_args(argv)
    # production overrides (text2nerf_main.py:657-665)
    args.use_support_set = True
    args.update_known_views = False
    args.use_filter_filling_holes = True
    args.use_rendered_img_to_warp = True
    args.N_voxel_init = 27_000_000
    args.N_voxel_final = 27_000_000
    args.batch_size = 1024 * 16
    args.regen_pose = True

    train_cfg, scene_cfg, expansion_cfg = cfg_mod.to_configs(args)
    set_seed(args.seed)

    # fall back to prompt-suffixed datadir like the reference
    # (text2nerf_main.py:408-409)
    if not os.path.isfile(os.path.join(scene_cfg.datadir, "rgbs/00000.png")):
        alt = scene_cfg.datadir + "_" + scene_cfg.prompt.replace(" ", "_")
        scene_cfg.datadir = alt

    if args.render_only and (args.render_test or args.render_path):
        trainer.render_test(train_cfg, scene_cfg)
        if args.export_mesh:
            _export_mesh(train_cfg.ckpt)
        return 0

    services = default_services(weights_dir=args.weights_dir, hw=scene_cfg.hw)
    mcfg, params, aabb, scene, logfolder = trainer.reconstruction(
        train_cfg, scene_cfg, services, expansion_cfg
    )
    if args.export_mesh:
        from .utils.mesh import export_field_mesh
        import os as _os

        export_field_mesh(
            mcfg, params, aabb, _os.path.join(logfolder, "mesh.ply")
        )
    return 0


def _export_mesh(ckpt_path):
    """--export_mesh for render-only runs: mesh from the checkpointed field."""
    from .engine.checkpoints import load_checkpoint
    from .utils.mesh import export_field_mesh
    import os as _os

    mcfg, params, aabb, _, _ = load_checkpoint(ckpt_path)
    export_field_mesh(
        mcfg, params, aabb,
        _os.path.join(_os.path.dirname(ckpt_path), "mesh.ply"),
    )


if __name__ == "__main__":
    sys.exit(main())
