"""OpenCV-FileStorage YAML I/O (utils/yaml_io.py).

Round-trip of the emitted subset, plus equivalence of the fast libyaml
loader (CSafeLoader) with pure-python SafeLoader on both our own dumps
and a reference-tree registry file (the CLI's registry load uses the
fast path; a parser divergence would corrupt every loaded template).
"""

import os

import pytest
import yaml

from shape_based_matching_tpu.utils.yaml_io import (dump_opencv_yaml,
                                                    load_opencv_yaml)

REF = "/root/reference"

DOC = {
    "class_id": "shape",
    "pyramid_levels": 2,
    "T": [4, 8],
    "weak_threshold": 30.0,
    "strong_threshold": 60.0,
    "scale": 0.9960000038146973,
    "note": 'quote"and\\slash',
    "empty": "",
    "template_pyramids": [
        {"template_id": 0,
         "templates": [
             {"width": 16, "height": 24, "tl_x": -3, "tl_y": 2,
              "pyramid_level": 0,
              "features": [[0, 1, 2], [15, 23, 7], [-1, 0, 0]]},
         ]},
    ],
}


def test_roundtrip(tmp_path):
    path = str(tmp_path / "doc.yaml")
    dump_opencv_yaml(DOC, path)
    assert load_opencv_yaml(path) == DOC


def test_roundtrip_gz(tmp_path):
    path = str(tmp_path / "doc.yaml.gz")
    dump_opencv_yaml(DOC, path)
    assert load_opencv_yaml(path) == DOC


def test_fast_loader_matches_safe_loader(tmp_path):
    if not hasattr(yaml, "CSafeLoader"):
        pytest.skip("libyaml not available")
    path = str(tmp_path / "doc.yaml")
    dump_opencv_yaml(DOC, path)
    text = open(path).read().split("---\n", 1)[1]
    assert (yaml.load(text, Loader=yaml.CSafeLoader)
            == yaml.load(text, Loader=yaml.SafeLoader))


def test_fast_loader_matches_on_reference_registry():
    """Both loaders agree on a real reference-trained registry (the
    case0 one is small enough to double-parse in CI)."""
    if not hasattr(yaml, "CSafeLoader"):
        pytest.skip("libyaml not available")
    path = os.path.join(REF, "test", "case0", "circle_templ.yaml")
    if not os.path.isfile(path):
        pytest.skip("reference mount absent")
    import re

    text = open(path).read()
    text = re.sub(r"^%YAML:[\d.]+\s*\n", "", text)
    a = yaml.load(text, Loader=yaml.CSafeLoader)
    b = yaml.load(text, Loader=yaml.SafeLoader)
    assert a == b
    assert a["template_pyramids"]
