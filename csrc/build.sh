#!/bin/sh
# Build the native degradation engine -> vspbfr_tpu/data/libvspbfr_degrade.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -I/usr/include/opencv4 \
    degrade.cpp \
    -lopencv_imgproc -lopencv_imgcodecs -lopencv_core \
    -o ../vspbfr_tpu/data/libvspbfr_degrade.so
echo "built vspbfr_tpu/data/libvspbfr_degrade.so"
