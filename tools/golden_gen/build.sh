#!/bin/bash
# Build the golden generator against the read-only reference sources.
set -e
g++ -O2 -std=c++14 -DMIPP_NO_INTRINSICS \
    -I. -I/root/reference -I/root/reference/MIPP \
    golden_gen.cpp -o golden_gen \
    $(pkg-config --cflags --libs opencv4) -lstdc++fs
