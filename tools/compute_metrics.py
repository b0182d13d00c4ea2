"""Offline quality metrics over saved renders.

Equivalent of the reference metrics tool
(/root/reference/extra/compute_metrics.py): compare rendered images against
ground-truth images on disk and aggregate PSNR/SSIM/(gated) LPIPS per scene.

Usage:
  python tools/compute_metrics.py --pred log/exp/imgs_test_all/rgbs \
      --gt data/scene/rgbs [--lpips-weights weights] [--out metrics.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text2nerf_tpu.data.io import read_rgb  # noqa: E402
from text2nerf_tpu.engine import metrics as M  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True, help="directory of rendered pngs")
    p.add_argument("--gt", required=True, help="directory of ground-truth pngs")
    p.add_argument("--lpips-weights", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    preds = sorted(glob.glob(os.path.join(args.pred, "*.png")))
    gts = sorted(glob.glob(os.path.join(args.gt, "*.png")))
    n = min(len(preds), len(gts))
    if n == 0:
        print(json.dumps({"error": "no image pairs found"}))
        return 1

    psnrs, ssims = [], []
    lpips_vals = {"alex": [], "vgg": []}  # both nets, like the reference
    for pred_path, gt_path in zip(preds[:n], gts[:n]):
        pred = read_rgb(pred_path)
        gt = read_rgb(gt_path)
        if pred.shape != gt.shape:
            import cv2

            pred = cv2.resize(pred, gt.shape[:2][::-1])
        psnrs.append(M.psnr(pred, gt))
        ssims.append(M.ssim(pred, gt, 1.0))
        if args.lpips_weights:
            # extra/compute_metrics.py:34-80 reports alex AND vgg
            for net in ("alex", "vgg"):
                try:
                    lpips_vals[net].append(
                        M.lpips(gt, pred, net, args.lpips_weights)
                    )
                except Exception:
                    pass

    result = {
        "n_images": n,
        "psnr_mean": float(np.mean(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
        "psnr_per_image": [float(x) for x in psnrs],
        "ssim_per_image": [float(x) for x in ssims],
    }
    for net, vals in lpips_vals.items():
        if vals:
            result[f"lpips_{net}_mean"] = float(np.mean(vals))
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
