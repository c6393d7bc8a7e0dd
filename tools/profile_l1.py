"""Device-true decomposition of the L1 frontend chain (fori-loop method).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_l1.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, image, R=16):
    def repeated(image):
        def body(i, carry):
            outs = fn(image ^ i.astype(jnp.uint8))
            return carry + sum(jnp.int32(jnp.sum(o.astype(jnp.int32)))
                               for o in outs)
        return jax.lax.fori_loop(0, R, body, jnp.int32(0))

    jr = jax.jit(repeated)
    out = jr(image)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = jr(image)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (3 * R) * 1e3


def main():
    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.pallas.frontend_pallas import (
        quant_spread_pallas)
    from shape_based_matching_tpu.ops.response import (linearize,
                                                       response_maps)

    rng = np.random.RandomState(0)
    image = jnp.asarray((rng.rand(1024, 1024) * 255).astype(np.uint8))

    t_pyr = timed(lambda x: (pyr_down_u8(x),), image)
    print(f"pyrdown 1024->512:            {t_pyr:7.3f} ms", flush=True)

    t_q = timed(lambda x: (quant_spread_pallas(
        pyr_down_u8(x), jnp.float32(900.0), 8),), image)
    print(f"+ quant_spread @512:          {t_q:7.3f} ms", flush=True)

    t_l = timed(lambda x: (linearize(quant_spread_pallas(
        pyr_down_u8(x), jnp.float32(900.0), 8)[None], 8)[0],), image)
    print(f"+ linearize T=8:              {t_l:7.3f} ms", flush=True)

    t_r = timed(lambda x: (response_maps(linearize(quant_spread_pallas(
        pyr_down_u8(x), jnp.float32(900.0), 8)[None], 8)[0]),), image)
    print(f"+ response:                   {t_r:7.3f} ms", flush=True)

    # L0 pieces for comparison
    t_q0 = timed(lambda x: (quant_spread_pallas(
        x, jnp.float32(900.0), 4),), image)
    print(f"quant_spread @1024 (L0):      {t_q0:7.3f} ms", flush=True)
    t_l0 = timed(lambda x: (linearize(quant_spread_pallas(
        x, jnp.float32(900.0), 4)[None], 4)[0],), image)
    print(f"+ linearize T=4 (L0):         {t_l0:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
