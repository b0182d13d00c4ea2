"""One-shot pretrained-weight conversion for a reference-style weights/ tree.

The reference's install step downloads five pretrained networks into
``weights/`` (README install section; text2img_sdm.py:7-30,
inpaint_sdm.py:48-74, depth_esti_boosting.py:171-202,
merge_model_single_channel.py:16-20, text2nerf_main.py:25-26).  This tool
converts everything it finds into the Flax artifacts the services load, so
a user switching from the reference runs exactly one command:

  python tools/convert_weights.py --weights weights [--out weights]

Per family:
- stable-diffusion-2-1-base/ and stable-diffusion-2-inpainting/
  (diffusers layout) are consumed *in place* by DiffusionPipeline —
  conversion here just validates layout and reports; pass --materialize
  to also write pre-converted .npz trees (faster startup).
- LeReS res101.pth / MiDaS model.pt / SGRNet model.pth.tar are validated
  via their loaders (the depth service converts lazily at startup).
- merge_model_sc checkpoints (latest_net_G.pth / epoch_*) convert to
  merge_model_sc.npz.
- clip-vit-base-patch32 converts both towers for the ranking service.

Prints one status line per family; exits non-zero if a present
checkpoint fails to convert (absent families are skipped, not errors).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _status(name, state, detail=""):
    print(json.dumps({"family": name, "status": state, "detail": detail}))
    return state != "error"


def convert_sd(weights_dir, name, inpaint, materialize, out_dir):
    d = os.path.join(weights_dir, name)
    if not os.path.isdir(d):
        return _status(name, "absent")
    try:
        import jax.numpy as jnp

        from text2nerf_tpu.services.diffusion_service import DiffusionPipeline

        pipe = DiffusionPipeline(d, inpaint=inpaint, hw=(512, 512),
                                 dtype=jnp.bfloat16)
        if pipe.tokenizer is None and not inpaint:
            return _status(name, "error", "tokenizer files missing")
        if materialize:
            from text2nerf_tpu.services.weight_convert import save_converted

            save_converted(os.path.join(out_dir, name + ".npz"), pipe.params)
        n = sum(x.size for x in _leaves(pipe.params))
        return _status(name, "converted", f"{n / 1e6:.0f}M params"
                       + (", tokenizer ok" if pipe.tokenizer else ""))
    except Exception as e:  # present-but-broken must fail loudly
        return _status(name, "error", str(e)[:200])


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def convert_depth(weights_dir):
    ok = True
    from text2nerf_tpu.services.depth_service import (
        _find_leres_checkpoint, _find_midas_checkpoint,
        _find_sgrnet_checkpoint,
    )
    from text2nerf_tpu.services import weight_convert as WC

    for name, find, load in (
        ("leres_res101", _find_leres_checkpoint, WC.load_leres_checkpoint),
        ("midas_v21", _find_midas_checkpoint, WC.load_midas_checkpoint),
        ("sgrnet", _find_sgrnet_checkpoint, WC.load_sgrnet_checkpoint),
    ):
        ckpt = find(os.path.join(weights_dir, "leres")) or find(weights_dir)
        if ckpt is None:
            ok &= _status(name, "absent")
            continue
        try:
            params = load(ckpt)
            n = sum(x.size for x in _leaves(params))
            ok &= _status(name, "converted", f"{ckpt} ({n / 1e6:.0f}M params)")
        except Exception as e:
            ok &= _status(name, "error", str(e)[:200])
    return ok


def convert_merge(weights_dir, out_dir):
    cands = sorted(
        glob.glob(os.path.join(weights_dir, "merge_model_sc", "**",
                               "*net_G*.pth"), recursive=True)
    ) + sorted(
        glob.glob(os.path.join(weights_dir, "**", "epoch_*"), recursive=True)
    )
    if not cands:
        return _status("merge_model_sc", "absent")
    try:
        import jax
        import jax.numpy as jnp

        from text2nerf_tpu.models.pix2pix import UnetGenerator
        from text2nerf_tpu.services import weight_convert as WC

        state = WC.load_torch_checkpoint(cands[0])
        net = UnetGenerator(input_nc=1, output_nc=1, num_downs=10)
        ref = jax.eval_shape(lambda: net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 1))))["params"]
        tree = WC.convert_torch_state_dict(
            state, WC.unet_generator_name_map(10))
        params = WC.fill_missing_params(tree, ref)
        WC.save_converted(os.path.join(out_dir, "merge_model_sc.npz"),
                          {"generator": params})
        return _status("merge_model_sc", "converted", cands[0])
    except Exception as e:
        return _status("merge_model_sc", "error", str(e)[:200])


def convert_lpips(weights_dir, out_dir):
    """LPIPS alex AND vgg (utils.py:413-425 supports both; the metrics
    tool reports both).  Needs the torchvision backbone state dict
    (alexnet*.pth / vgg16*.pth) plus the lpips v0.1 linear heads
    ({alex,vgg}.pth, keys lin{i}.model.1.weight) anywhere under
    weights/."""
    from text2nerf_tpu.services import weight_convert as WC

    ok = True
    for net, bb_glob in (("alex", "alexnet*.pth"), ("vgg", "vgg16*.pth")):
        lin = sorted(glob.glob(
            os.path.join(weights_dir, "**", f"{net}.pth"), recursive=True))
        bb = sorted(glob.glob(
            os.path.join(weights_dir, "**", bb_glob), recursive=True))
        if not lin or not bb:
            ok &= _status(f"lpips_{net}", "absent")
            continue
        try:
            state = WC.load_torch_checkpoint(bb[0])
            state.update(WC.load_torch_checkpoint(lin[0]))
            name_map = (WC.lpips_alex_name_map() if net == "alex"
                        else WC.lpips_vgg_name_map())
            tree = WC.convert_torch_state_dict(state, name_map)
            WC.save_converted(os.path.join(out_dir, f"lpips_{net}.npz"), tree)
            ok &= _status(f"lpips_{net}", "converted", bb[0])
        except Exception as e:
            ok &= _status(f"lpips_{net}", "error", str(e)[:200])
    return ok


def convert_clip(weights_dir, out_dir):
    d = os.path.join(weights_dir, "clip-vit-base-patch32")
    if not os.path.isdir(d):
        return _status("clip-vit-base-patch32", "absent")
    try:
        from text2nerf_tpu.services.clip_rank import make_clip_ranker

        make_clip_ranker(d)
        return _status("clip-vit-base-patch32", "converted")
    except Exception as e:
        return _status("clip-vit-base-patch32", "error", str(e)[:200])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="weights")
    p.add_argument("--out", default=None,
                   help="output dir for .npz artifacts (default: --weights)")
    p.add_argument("--materialize", action="store_true",
                   help="also write pre-converted SD .npz trees")
    args = p.parse_args(argv)
    out_dir = args.out or args.weights
    os.makedirs(out_dir, exist_ok=True)

    ok = True
    ok &= convert_sd(args.weights, "stable-diffusion-2-1-base", False,
                     args.materialize, out_dir)
    ok &= convert_sd(args.weights, "stable-diffusion-2-inpainting", True,
                     args.materialize, out_dir)
    ok &= convert_depth(args.weights)
    ok &= convert_merge(args.weights, out_dir)
    ok &= convert_clip(args.weights, out_dir)
    ok &= convert_lpips(args.weights, out_dir)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
