"""python -m shape_based_matching_tpu.native.build — compile the host lib."""
from . import build

if __name__ == "__main__":
    raise SystemExit(0 if build(verbose=True) else 1)
