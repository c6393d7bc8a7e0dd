"""On-chip A/B: in-kernel counted extraction vs the full-words compare
pass on the chain route.

Runs the driver's own e2e match step (__graft_entry__.entry) twice in
one process — once with the counted epilogue disabled
(SBM_NO_COUNTED_EXTRACT=1 -> extract_candidates_chain_words' compare
pass re-reads the whole words array, ~1.9 ms at K=10k per
tools/exp_chain_cost.py W1), once enabled (kernel counts the finished
tile in registers; extraction is O(C) work). Asserts EXACT match-set
equality, then decides speed with the paired interleaved harness
(tools/ab_bench.py: ABBA pairs, exact sign test, bootstrap CI).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/exp_counted_ab.py [K] [n_pairs]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from ab_bench import ab_compare  # noqa: E402


def match_set(out):
    k, x, y, sc, valid, n_above = out
    k, x, y, valid = (np.asarray(a) for a in (k, x, y, valid))
    scb = np.asarray(sc).view(np.int32)
    idx = np.nonzero(valid)[0]
    return {(int(k[i]), int(x[i]), int(y[i]), int(scb[i])) for i in idx}


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    inner = 20

    import jax

    import __graft_entry__ as g

    t0 = time.time()
    os.environ["SBM_NO_COUNTED_EXTRACT"] = "1"
    fn_a, args_a = g.entry(num_templates=K)
    jit_a = jax.jit(fn_a)
    out_a = jax.block_until_ready(jit_a(*args_a))

    os.environ.pop("SBM_NO_COUNTED_EXTRACT")
    fn_b, args_b = g.entry(num_templates=K)
    jit_b = jax.jit(fn_b)
    out_b = jax.block_until_ready(jit_b(*args_b))
    print(f"setup+compile 2x K={K}: {time.time() - t0:.0f} s", flush=True)

    sa, sb = match_set(out_a), match_set(out_b)
    print(f"match sets: words {len(sa)}, counted {len(sb)}, "
          f"equal={sa == sb}", flush=True)
    assert sa == sb, "counted output differs from words route!"

    def blk(jit_fn, args):
        def run():
            out = None
            for _ in range(inner):
                out = jit_fn(*args)
            jax.block_until_ready(out)
        return run

    res = ab_compare(blk(jit_a, args_a), blk(jit_b, args_b),
                     n_pairs=n_pairs, inner=inner,
                     name_a="words", name_b="counted")
    print(res.summary())


if __name__ == "__main__":
    main()
