"""Replica of OpenCV's fastAtan2 so orientation bins match the reference.

cv::phase(dx, dy, degrees=true) (used at line2Dup.cpp:327,398) computes angles
with cv::fastAtan2 — a degree-7 polynomial approximation, NOT a true atan2.
Quantization into 16 buckets happens downstream via round(angle * 16/360), so
we must reproduce the same polynomial (max observed deviation vs cv2 is
~3e-5 degrees from FMA/ordering differences; a bucket flip requires the true
angle to sit within 3e-5° of a 22.5° boundary, which is negligible).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# Plain Python floats (cast at use): jnp scalars would be captured
# closure constants, which Pallas kernels reject.
_P1 = float(np.float32(0.9997878412794807 * (180.0 / math.pi)))
_P3 = float(np.float32(-0.3258083974640975 * (180.0 / math.pi)))
_P5 = float(np.float32(0.1555786518463281 * (180.0 / math.pi)))
_P7 = float(np.float32(-0.04432655554792128 * (180.0 / math.pi)))
_DBL_EPS = 2.220446049250313e-16


def phase_deg(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Angle in degrees in [0, 360), cv::fastAtan2 semantics, float32."""
    x = dx.astype(jnp.float32)
    y = dy.astype(jnp.float32)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    eps = jnp.float32(_DBL_EPS)
    c = jnp.where(ax >= ay, ay / (ax + eps), ax / (ay + eps))
    c2 = c * c
    a = (((jnp.float32(_P7) * c2 + jnp.float32(_P5)) * c2
          + jnp.float32(_P3)) * c2 + jnp.float32(_P1)) * c
    a = jnp.where(ax < ay, jnp.float32(90.0) - a, a)
    a = jnp.where(x < 0, jnp.float32(180.0) - a, a)
    a = jnp.where(y < 0, jnp.float32(360.0) - a, a)
    return a
