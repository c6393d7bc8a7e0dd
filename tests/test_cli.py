"""End-to-end CLI smoke test: train from a synthetic image, batch match."""

import json
import os

import numpy as np

from shape_based_matching_tpu.cli import main
from shape_based_matching_tpu.utils.synthetic import (synthetic_scene,
                                                      synthetic_shape_image)
from shape_based_matching_tpu.utils.viz import save_image


def test_cli_demo_case2_synthetic(tmp_path):
    """Demo driver plumbing (test.cpp noise_test shape) on a synthetic
    mini-case: train with a coarse angle step, then match + NMS."""
    templ = synthetic_shape_image(96, seed=3)
    scene = synthetic_scene(256, 256, templ, n_instances=2, seed=9)

    case = tmp_path / "case2"
    case.mkdir()
    save_image(templ, str(case / "train.png"))
    save_image(scene, str(case / "test.png"))

    rc = main(["demo", "case2", "--data", str(tmp_path),
               "--out", str(case), "--mode", "train",
               "--angle-step", "90", "--gray"])
    assert rc == 0
    assert os.path.exists(str(case / "test_templ.yaml"))
    assert os.path.exists(str(case / "test_info.yaml"))

    out = tmp_path / "out"
    rc = main(["demo", "case2", "--data", str(tmp_path),
               "--out", str(out), "--threshold", "60", "--gray"])
    assert rc == 0
    assert os.path.exists(str(out / "case2_result.png"))
    with open(str(out / "case2_matches.json")) as f:
        rows = json.load(f)
    assert len(rows) >= 1
    assert all(r["similarity"] >= 60 for r in rows)


def test_cli_train_and_match(tmp_path):
    templ = synthetic_shape_image(128, seed=0)
    scene = synthetic_scene(256, 256, templ, n_instances=2, seed=5)

    img_path = str(tmp_path / "templ.png")
    save_image(templ, img_path)
    frames = tmp_path / "frames"
    frames.mkdir()
    save_image(scene, str(frames / "scene.png"))

    model_dir = str(tmp_path / "models")
    rc = main(["train", "--model-dir", model_dir, "--class-id", "shape",
               "--image", img_path, "--angles", "0,90",
               "--scales", "1.0", "--num-features", "48", "--gray"])
    assert rc == 0
    assert os.path.exists(os.path.join(model_dir, "shape.yaml.gz"))
    assert os.path.exists(os.path.join(model_dir, "detector_linemod.yaml"))
    with open(os.path.join(model_dir, "registry.json")) as f:
        registry = json.load(f)
    assert "shape" in registry

    out_dir = str(tmp_path / "out")
    csv = str(tmp_path / "timings.csv")
    rc = main(["match", "--model-dir", model_dir,
               "--test-dir", str(frames), "--threshold", "80",
               "--csv", csv, "--annotate", out_dir, "--gray"])
    assert rc == 0
    assert os.path.exists(csv)
    with open(csv) as f:
        content = f.read()
    assert content.startswith("stat,MATCH,NMS,VERIFY")
    assert os.path.exists(os.path.join(out_dir, "scene.png.match.png"))


def test_cli_info():
    rc = main(["info", "--size", "512x512"])
    assert rc == 0


def test_cli_trace(tmp_path):
    """--trace wraps the command in jax.profiler.trace and leaves a
    TensorBoard plugin trace directory behind."""
    trace_dir = str(tmp_path / "trace")
    rc = main(["--trace", trace_dir, "info", "--size", "512x512"])
    assert rc == 0
    dumped = []
    for root, _dirs, files in os.walk(trace_dir):
        dumped += [os.path.join(root, f) for f in files]
    assert dumped, "profiler trace produced no files"


def test_cli_match_spatial_shards(tmp_path, capsys):
    """--spatial-shards routes frames through match_huge_frame (row
    sharding over the virtual CPU mesh) and must report the same matches
    as the single-device CLI match."""
    templ = synthetic_shape_image(96, seed=2)
    scene = synthetic_scene(1024, 256, templ, n_instances=2, seed=11)

    img_path = str(tmp_path / "templ.png")
    save_image(templ, img_path)
    frames = tmp_path / "frames"
    frames.mkdir()
    save_image(scene, str(frames / "scene.png"))

    model_dir = str(tmp_path / "models")
    rc = main(["train", "--model-dir", model_dir, "--class-id", "shape",
               "--image", img_path, "--angles", "0",
               "--scales", "1.0", "--num-features", "48", "--gray"])
    assert rc == 0

    def run(extra):
        rc = main(["match", "--model-dir", model_dir, "--test-dir",
                   str(frames), "--threshold", "80", "--nms", "0.5",
                   "--gray"] + extra)
        assert rc == 0
        out = capsys.readouterr().out
        return sorted(l.strip() for l in out.splitlines()
                      if l.strip().startswith("class="))

    single = run([])
    sharded = run(["--spatial-shards", "2"])
    assert single and sharded == single


def test_cli_match_icp_flag(tmp_path, capsys):
    """--icp appends a refined subpixel pose to each reported match."""
    templ = synthetic_shape_image(128, seed=0)
    scene = synthetic_scene(256, 256, templ, n_instances=1, seed=5)

    img_path = str(tmp_path / "templ.png")
    save_image(templ, img_path)
    frames = tmp_path / "frames"
    frames.mkdir()
    save_image(scene, str(frames / "scene.png"))

    model_dir = str(tmp_path / "models")
    rc = main(["train", "--model-dir", model_dir, "--class-id", "shape",
               "--image", img_path, "--angles", "0",
               "--scales", "1.0", "--num-features", "48", "--gray"])
    assert rc == 0
    rc = main(["match", "--model-dir", model_dir, "--test-dir", str(frames),
               "--threshold", "80", "--gray", "--icp"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "icp[x=" in out and "dtheta=" in out
