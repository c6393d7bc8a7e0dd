#!/bin/bash
# Build the 16-ori golden generator: the experiment .cpp against the
# reconstructed ori16/ header (must shadow /root/reference/line2Dup.h).
set -e
g++ -O2 -std=c++14 -msse4.1 -mssse3 \
    -Iori16 -I/root/reference/test/ori_16bit_experiment \
    golden_gen_16.cpp -o golden_gen_16 \
    $(pkg-config --cflags --libs opencv4) -lstdc++fs
