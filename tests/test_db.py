"""Plant-database bridge tests (utils.cpp:41-111, test_jabil.cpp:47-240).

Covers the parsePositions replica, the DAO accessor surface, the
extract-fiducials validation flow, and the end-to-end DB-driven CLI
(train-db -> match-db) on a synthetic tag model.
"""

import json
import os

import numpy as np
import pytest

from shape_based_matching_tpu.cli import main
from shape_based_matching_tpu.db import (TagDB, extract_tag_model_fiducials,
                                         fiducial_crop_path,
                                         make_fiducial_geo, parse_positions)
from shape_based_matching_tpu.utils.synthetic import (synthetic_scene,
                                                      synthetic_shape_image)
from shape_based_matching_tpu.utils.viz import save_image


def test_parse_positions_truncation():
    # 0.37 * 640 = 236.8 -> int() truncation (utils.cpp:51 "maybe should
    # be ceil()... and isn't"), string-valued fields like the DB stores.
    geo = json.dumps({"X": "0.37", "Y": "0.25", "width": "0.1",
                      "height": "0.5", "X_pixels": "236", "Y_pixels": "120",
                      "width_pixels": "64", "height_pixels": "240",
                      "w_image": "640", "h_image": "480"})
    box = parse_positions(geo, (640, 480))
    assert (box.x, box.y) == (236, 120)
    assert (box.width, box.height) == (64, 240)
    assert (box.w_image, box.h_image) == (640, 480)


def test_parse_positions_empty_raises():
    with pytest.raises(ValueError):
        parse_positions("{}", (100, 100))
    with pytest.raises(ValueError):
        parse_positions("not json", (100, 100))


def _make_db(tmp_path, model_img_path, size, crops, model_id=7,
             name="tag-model"):
    db = TagDB(str(tmp_path / "tags.sqlite"))
    fields = []
    for i, (fid, box, ftype) in enumerate(crops):
        db.add_tag_field(fid, f"field{i}", ftype)
        x, y, w, h = box
        fields.append((fid, make_fiducial_geo(x / size[0], y / size[1],
                                              w / size[0], h / size[1],
                                              size)))
    db.add_tag_model(model_id, name, model_img_path, fields)
    return db


def test_extract_tag_model_fiducials(tmp_path):
    img = synthetic_shape_image(128, seed=3)
    path = str(tmp_path / "model.png")
    save_image(img, path)
    # one fiducial-type field (3), one other-type field (1, must be skipped)
    db = _make_db(tmp_path, path, (128, 128),
                  [(11, (32, 16, 64, 64), 3), (12, (0, 0, 32, 32), 1)])
    tags = extract_tag_model_fiducials(db)
    assert len(tags) == 1
    tag = tags[0]
    assert tag.model_id == 7 and tag.model_name == "tag-model"
    assert tag.image_size == (128, 128)
    assert tag.crops == [(11, (32, 16, 64, 64))]
    db.close()


def test_extract_out_of_bounds_raises(tmp_path):
    img = synthetic_shape_image(64, seed=1)
    path = str(tmp_path / "model.png")
    save_image(img, path)
    db = _make_db(tmp_path, path, (64, 64), [(5, (48, 48, 32, 32), 3)])
    with pytest.raises(ValueError, match="template database"):
        extract_tag_model_fiducials(db)
    db.close()


def test_fiducial_crop_path():
    assert (fiducial_crop_path("/data/model_images/tag7.png", 3)
            == "/data/model_images/tag7.3.png")


def test_db_cli_train_and_match(tmp_path):
    # synthetic tag model: the fiducial shape sits at a known crop of the
    # model image; the scene contains instances of that same shape.
    fid_shape = synthetic_shape_image(96, seed=0)
    model_img = np.zeros((192, 192), np.uint8)
    model_img[32:128, 48:144] = fid_shape
    model_path = str(tmp_path / "tag_model.png")
    save_image(model_img, model_path)

    db = _make_db(tmp_path, model_path, (192, 192),
                  [(3, (48, 32, 96, 96), 3)], model_id=42, name="m42")
    db_path = db.path
    db.close()

    model_dir = str(tmp_path / "model_images")
    rc = main(["train-db", "--db", db_path, "--model-dir", model_dir,
               "--num-features", "48", "--weak", "30", "--strong", "60",
               "--angles", "0", "--scales", "1.0"])
    assert rc == 0
    assert os.path.exists(os.path.join(model_dir, "42.yaml.gz"))
    assert os.path.exists(os.path.join(model_dir, "detector_linemod.yaml"))
    # the fiducial crop is stored next to the model image,
    # <stem>.<tagFieldID><ext> (test_jabil.cpp:70-76)
    assert os.path.exists(str(tmp_path / "tag_model.3.png"))

    scene = synthetic_scene(256, 256, fid_shape, n_instances=2, seed=5)
    frames = tmp_path / "frames"
    frames.mkdir()
    save_image(scene, str(frames / "scene.png"))

    out_dir = str(tmp_path / "out")
    csv = str(tmp_path / "timings.csv")
    rc = main(["match-db", "--db", db_path, "--model-dir", model_dir,
               "--test-dir", str(frames), "--threshold", "80",
               "--verify-ccorr", "0.5", "--csv", csv,
               "--annotate", out_dir, "--gray"])
    assert rc == 0
    with open(csv) as f:
        assert f.read().startswith("stat,MATCH,NMS,HCORR")
    assert os.path.exists(os.path.join(out_dir, "scene.png.match.png"))
