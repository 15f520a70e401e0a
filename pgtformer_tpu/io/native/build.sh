#!/bin/sh
# Build the native video I/O shim (libvideoio.so).
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 videoio.cc -o libvideoio.so \
    $(pkg-config --cflags --libs libavformat libavcodec libavutil libswscale) \
    -lpthread
echo "built $(pwd)/libvideoio.so"
