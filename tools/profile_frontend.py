"""Frontend sub-chain timings at 1024² (sums returned to avoid output-write
skew). Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_frontend.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=50):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from shape_based_matching_tpu.ops.filters import (gaussian_blur7_u8,
                                                      pyr_down_u8,
                                                      sobel3_f32)
    from shape_based_matching_tpu.ops.fastmath import phase_deg
    from shape_based_matching_tpu.ops.gradients import (
        hysteresis_quantize, quantized_orientations_gray)
    from shape_based_matching_tpu.ops.response import (linearize,
                                                       response_maps, spread)

    rng = np.random.RandomState(0)
    img = jnp.asarray((rng.rand(1024, 1024) * 255).astype(np.uint8))

    t_blur = bench(lambda x: jnp.sum(gaussian_blur7_u8(x).astype(jnp.int32)),
                   img)
    t_sobel = bench(
        lambda x: jnp.sum(sobel3_f32(gaussian_blur7_u8(x), True)
                          + sobel3_f32(gaussian_blur7_u8(x), False)), img)

    def upto_atan(x):
        s = gaussian_blur7_u8(x)
        dx = sobel3_f32(s, True)
        dy = sobel3_f32(s, False)
        return jnp.sum(phase_deg(dx, dy))

    t_atan = bench(upto_atan, img)

    def upto_quant(x):
        g = quantized_orientations_gray(x, jnp.float32(30.0))
        return jnp.sum(g.angle.astype(jnp.int32))

    t_quant = bench(upto_quant, img)

    quant = quantized_orientations_gray(img, jnp.float32(30.0)).angle

    for T in (4, 8):
        t_spread = bench(
            lambda q, T=T: jnp.sum(spread(q, T).astype(jnp.int32)), quant)
        t_resp = bench(
            lambda q, T=T: jnp.sum(
                response_maps(spread(q, T)).astype(jnp.int32)), quant)
        t_lin = bench(
            lambda q, T=T: jnp.sum(
                linearize(response_maps(spread(q, T)), T)
                .astype(jnp.int32)), quant)
        t_lin_w = bench(lambda q, T=T: linearize(response_maps(spread(q, T)),
                                                 T), quant)
        print(f"T={T}: +spread {t_spread:6.3f}  +resp {t_resp:6.3f}  "
              f"+lin(sum) {t_lin:6.3f}  +lin(write) {t_lin_w:6.3f} ms")

    t_pyr = bench(lambda x: jnp.sum(pyr_down_u8(x).astype(jnp.int32)), img)
    print(f"blur {t_blur:.3f}  +sobel {t_sobel:.3f}  +atan {t_atan:.3f}  "
          f"+quant {t_quant:.3f}  pyrdown {t_pyr:.3f} ms")


if __name__ == "__main__":
    main()
