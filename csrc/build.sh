#!/bin/sh
# Build the native host library (runtime/native.py loads it via ctypes).
set -e
cd "$(dirname "$0")"
CXX=${CXX:-g++}
$CXX -O3 -march=native -fPIC -shared -o libvrt.so builder.cpp
echo "built $(pwd)/libvrt.so"
