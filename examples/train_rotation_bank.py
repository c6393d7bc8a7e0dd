"""Train a rotation template bank and persist it (angle_test pattern).

The reference's canonical training flow (test.cpp:262-420): extract ONE
template from an ROI, derive every other rotation by direct feature
rotation (no image re-rendering), write the class YAML + the shape-info
registry. Runs in seconds for a 1-degree sweep thanks to the vectorized
rotation math.

Usage: python examples/train_rotation_bank.py [out_dir]
"""

import sys

import numpy as np

from shape_based_matching_tpu import Detector, ShapeInfoProducer
from shape_based_matching_tpu.utils.synthetic import synthetic_shape_image


def main(out_dir: str = "/tmp/sbm_bank", angle_step: float = 1.0,
         size: int = 256) -> str:
    import os

    os.makedirs(out_dir, exist_ok=True)
    img = synthetic_shape_image(size, seed=0)
    mask = np.full(img.shape, 255, np.uint8)

    det = Detector(num_features=63, T=(4, 8))
    shapes = ShapeInfoProducer(img, mask)
    shapes.angle_range = [0.0, 360.0]
    shapes.angle_step = angle_step
    shapes.produce_infos()

    # first angle trains from pixels; the rest derive by the BATCHED
    # feature rotation (bit-identical to per-angle add_template_rotate,
    # one vectorized pass for the whole sweep)
    first = shapes.infos[0]
    first_id = det.add_template(shapes.src_of(first), "part",
                                shapes.mask_of(first))
    kept = [first] if first_id != -1 else []
    rest = shapes.infos[1:]
    if first_id != -1 and rest:
        ids = det.add_templates_rotate(
            "part", first_id, [i.angle - first.angle for i in rest],
            (size / 2.0, size / 2.0))
        kept.extend(info for info, tid in zip(rest, ids) if tid != -1)

    det.write_classes(os.path.join(out_dir, "%s.yaml.gz"))
    det.save_settings(os.path.join(out_dir, "detector_linemod.yaml"),
                      templates_dir=out_dir)
    ShapeInfoProducer.save_infos(kept, os.path.join(out_dir, "infos.yaml"))
    print(f"{det.num_templates('part')} templates -> {out_dir}")
    return out_dir


if __name__ == "__main__":
    main(*sys.argv[1:2])
