#!/bin/bash
# Build the native loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -Wall vfloader.cpp -lz -lpthread \
  -o libvfloader.so
echo "built $(pwd)/libvfloader.so"
