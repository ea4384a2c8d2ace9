#!/bin/sh
# Build the native components into this directory.
set -e
cd "$(dirname "$0")"

g++ -O2 -shared -fPIC -std=c++14 exr_io.cpp -o libexr_io.so \
    -I/usr/include/OpenEXR -I/usr/include/Imath \
    -lOpenEXR-3_1 -lIex-3_1 -lIlmThread-3_1 -lImath-3_1

g++ -O2 -shared -fPIC -std=c++17 bvh_builder.cpp -o libbvh.so

echo "built: $(ls -la libexr_io.so libbvh.so)"
