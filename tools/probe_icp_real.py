"""Probe pose conventions for the real-texture ICP accuracy test.

Rotates case1's real frame by known sub-degree angles/scales (bilinear
warp about the image center) and prints what match_icp recovers —
template ids, dtheta, dscale — so the test can pin the sign
conventions deterministically.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def warp_rot_scale(img: np.ndarray, angle_deg: float,
                   scale: float) -> np.ndarray:
    """Bilinear inverse warp: rotate by angle (CCW in image coords,
    OpenCV getRotationMatrix2D convention) + scale about the center."""
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    phi = np.deg2rad(angle_deg)
    ca, sa = np.cos(phi), np.sin(phi)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dx, dy = xs - cx, ys - cy
    # forward map p' = s R p => inverse q = R^-1 p / s
    qx = (ca * dx + sa * dy) / scale + cx
    qy = (-sa * dx + ca * dy) / scale + cy
    x0 = np.floor(qx).astype(int)
    y0 = np.floor(qy).astype(int)
    fx, fy = qx - x0, qy - y0
    ok = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    t = img.astype(np.float64)
    val = ((1 - fy) * ((1 - fx) * t[y0c, x0c] + fx * t[y0c, x0c + 1])
           + fy * ((1 - fx) * t[y0c + 1, x0c] + fx * t[y0c + 1, x0c + 1]))
    out = np.where(ok, val, 0.0)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def main():
    from golden_utils import load_mat

    from shape_based_matching_tpu import Detector
    from shape_based_matching_tpu.utils.verify import bgr2gray_u8

    det = Detector(num_features=128, T=(4, 8))
    det.read_classes(["test"], "/root/reference/test/case1/%s_templ.yaml")
    img = load_mat("case1_img.bin")
    if img.ndim == 3:
        img = bgr2gray_u8(img)
    print("img", img.shape, img.dtype)

    base = det.match_icp(img, 90.0, top_c=4)[0]
    m0 = base["match"]
    t0 = det.get_templates("test", m0.template_id)[0]
    print("base: tid", m0.template_id, "sim", m0.similarity,
          "xy", (m0.x, m0.y), "orient", t0.orientation,
          "sscale", t0.sscale, "dtheta", base["dtheta_deg"],
          "dscale", base["dscale"], "valid", base["valid"],
          "inliers", base["inliers"])

    for ang, sc in [(0.4, 1.0), (-0.3, 1.0), (0.0, 1.004),
                    (0.5, 0.997)]:
        wimg = warp_rot_scale(img, ang, sc)
        res = det.match_icp(wimg, 80.0, top_c=4)
        if not res:
            print(f"warp({ang}, {sc}): NO MATCH")
            continue
        r = res[0]
        m = r["match"]
        t = det.get_templates("test", m.template_id)[0]
        print(f"warp({ang:+.2f}deg, x{sc}): tid", m.template_id,
              "sim", m.similarity, "orient", t.orientation,
              "dtheta", round(r["dtheta_deg"], 4),
              "dscale", round(r["dscale"], 5),
              "inliers", r["inliers"], "valid", r["valid"])


if __name__ == "__main__":
    main()
