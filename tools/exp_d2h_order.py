"""Probe: does a D2H pull through the tunnel wait behind LATER-enqueued
device programs, and does copy_to_host_async() issued before them fix it?

Three timelines over the same heavy program P (~tens of ms) on buffers
a (ready) and b (queued):

  T0  compute a; block. pull a with nothing queued.        -> baseline pull
  T1  compute a; block. enqueue P(b) x DEPTH, THEN pull a. -> if pull_T1 >>
      pull_T0, transfers are serialized behind queued executions.
  T2  compute a; block. a.copy_to_host_async(); enqueue P(b) x DEPTH;
      then np.asarray(a).                                  -> does the early
      transfer request bypass the queue?

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/exp_d2h_order.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def heavy(x):
    # ~40 matmuls of 2048^2 f32: tens of ms of MXU work
    def body(i, acc):
        return acc @ x * (1.0 / 2048.0)

    return jax.lax.fori_loop(0, 40, body, x)


@jax.jit
def small(x):
    return (x[:128, :128] * 2.0).sum(axis=0)


def main():
    x = jnp.asarray(np.random.RandomState(0).rand(2048, 2048),
                    dtype=jnp.float32)
    jax.block_until_ready(x)
    jax.block_until_ready(heavy(x))
    a0 = small(x)
    jax.block_until_ready(a0)
    np.asarray(a0)  # compile + warm the pull path

    DEPTH = 4
    REPS = 10

    def t0():
        a = small(x)
        jax.block_until_ready(a)
        t = time.perf_counter()
        np.asarray(a)
        return time.perf_counter() - t

    def t1():
        a = small(x)
        jax.block_until_ready(a)
        bs = [heavy(x) for _ in range(DEPTH)]
        t = time.perf_counter()
        np.asarray(a)
        dt = time.perf_counter() - t
        jax.block_until_ready(bs)
        return dt

    def t2():
        a = small(x)
        jax.block_until_ready(a)
        a.copy_to_host_async()
        bs = [heavy(x) for _ in range(DEPTH)]
        t = time.perf_counter()
        np.asarray(a)
        dt = time.perf_counter() - t
        jax.block_until_ready(bs)
        return dt

    # how long DEPTH heavy programs take (what a serialized pull waits on)
    t = time.perf_counter()
    jax.block_until_ready([heavy(x) for _ in range(DEPTH)])
    heavy_ms = (time.perf_counter() - t) * 1e3
    print(f"DEPTH={DEPTH} heavy block: {heavy_ms:.1f} ms")

    for name, fn in [("T0 pull, empty queue   ", t0),
                     ("T1 pull behind queue   ", t1),
                     ("T2 async-copy then pull", t2)]:
        ts = sorted(fn() * 1e3 for _ in range(REPS))
        print(f"{name}: median {ts[REPS // 2]:7.2f} ms  "
              f"min {ts[0]:7.2f}  max {ts[-1]:7.2f}")


if __name__ == "__main__":
    main()
