"""Day-one real-weights acceptance: the per-checkpoint manifest either
passes a correctly-laid-out tree or fails with a PRECISE diff naming the
offending file / state-dict key / shape and the conversion map it belongs
to (VERDICT r4 item 6).  Conversion-map correctness itself is covered by
the torch-replica golden tests (test_leres_convert.py etc.); this file
covers the acceptance tooling."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from text2nerf_tpu.models.leres import LeReSConfig, RelDepthModel
from text2nerf_tpu.services import weight_convert as WC
from text2nerf_tpu.services import weights_manifest as WM


def _fabricate_leres_state():
    """A state dict carrying every mapped key at the exact torch shape the
    real res101.pth has (derived by inverting the conversion layout)."""
    cfg = LeReSConfig.resnext101()
    name_map = WC.leres_name_map(cfg)
    ref = jax.eval_shape(lambda: RelDepthModel(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))["params"]
    state = {}
    for tname, fpath in name_map.items():
        leaf = WM._flax_leaf(ref, fpath)
        assert leaf is not None, fpath
        state[tname] = torch.zeros(WM.expected_torch_shape(fpath, leaf.shape))
    return state


def test_absent_tree_is_all_absent(tmp_path):
    reports = WM.validate_tree(str(tmp_path / "nowhere"))
    assert all(r["status"] == "absent" for r in reports)
    assert {r["family"] for r in reports} == set(WM.EPS_NOTES)


def test_correct_leres_layout_passes(tmp_path):
    torch.save({"depth_model": _fabricate_leres_state()},
               tmp_path / "res101.pth")
    reports = {r["family"]: r for r in WM.validate_tree(str(tmp_path))}
    assert reports["leres"]["status"] == "ok", reports["leres"]["diffs"]
    assert reports["leres"]["eps"]  # conventions recorded in the report
    # everything else stays absent
    assert reports["midas"]["status"] == "absent"
    assert reports["stable-diffusion-2-1-base"]["status"] == "absent"


def test_wrong_shape_names_key_and_map(tmp_path):
    state = _fabricate_leres_state()
    bad_key = "depth_model.encoder_modules.conv1.weight"
    state[bad_key] = torch.zeros((64, 4, 7, 7))  # 4-channel stem: wrong
    torch.save({"depth_model": state}, tmp_path / "res101.pth")
    reports = {r["family"]: r for r in WM.validate_tree(str(tmp_path))}
    r = reports["leres"]
    assert r["status"] == "error"
    assert len(r["diffs"]) == 1
    d = r["diffs"][0]
    assert bad_key in d and "leres_name_map" in d
    assert "(64, 4, 7, 7)" in d and "(64, 3, 7, 7)" in d


def test_missing_keys_are_named(tmp_path):
    state = _fabricate_leres_state()
    dropped = [k for k in state if "decoder_modules" in k]
    for k in dropped:
        del state[k]
    torch.save({"depth_model": state}, tmp_path / "res101.pth")
    reports = {r["family"]: r for r in WM.validate_tree(str(tmp_path))}
    r = reports["leres"]
    assert r["status"] == "error"
    named = [d for d in r["diffs"] if "missing key" in d]
    assert named and all("leres_name_map" in d for d in named)
    assert any(dropped[0] in d for d in named)


def test_sd_spot_catches_wrong_unet_variant(tmp_path):
    """A 9-channel inpainting UNet dropped into the base tree is named."""
    d = tmp_path / "stable-diffusion-2-1-base"
    for f in WM._SD_FILES:
        p = d / f
        os.makedirs(p.parent, exist_ok=True)
        p.write_text("{}")
    torch.save(
        {"conv_in.weight": torch.zeros((320, 9, 3, 3)),
         "time_embedding.linear_1.weight": torch.zeros((1280, 320))},
        d / "unet" / "diffusion_pytorch_model.bin",
    )
    r = WM._validate_sd_tree(str(tmp_path), "stable-diffusion-2-1-base")
    assert r["status"] == "error"
    assert any("conv_in.weight" in x and "(320, 4, 3, 3)" in x
               for x in r["diffs"])
    # the missing vae/text_encoder checkpoints are ALSO named
    assert any("vae" in x for x in r["diffs"])


def test_smoke_harness_fails_fast_on_bad_manifest(tmp_path, capsys):
    """tools/smoke_real_weights exits 1 with the named diffs before doing
    any conversion or training work."""
    state = _fabricate_leres_state()
    state["depth_model.encoder_modules.conv1.weight"] = torch.zeros(
        (64, 4, 7, 7))
    wdir = tmp_path / "weights"
    os.makedirs(wdir)
    torch.save({"depth_model": state}, wdir / "res101.pth")

    from tools import smoke_real_weights

    rc = smoke_real_weights.main(
        ["--weights", str(wdir), "--out", str(tmp_path / "out"),
         "--hw", "32", "--views", "2", "--grid", "24"]
    )
    assert rc == 1
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.startswith("{")]
    err = [x for x in lines if x.get("status") == "error"]
    assert err and err[0]["families"] == ["leres"]
    assert any("conv1.weight" in d for d in err[0]["diffs"])
