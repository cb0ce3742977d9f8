#!/bin/bash
# Build the native loader shared library.
# Compiles to a temp name and renames atomically so a concurrent reader
# (multi-process training on one host) never dlopens a partial .so.
set -e
cd "$(dirname "$0")"
tmp="libvfloader.so.tmp.$$"
g++ -O3 -std=c++17 -shared -fPIC -Wall vfloader.cpp -lz -lpthread \
  -o "$tmp"
mv -f "$tmp" libvfloader.so
echo "built $(pwd)/libvfloader.so"
