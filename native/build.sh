#!/bin/sh
# Build the native CMAQ data-plane library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -pthread -std=c++17 -o libcmaq_loader.so cmaq_loader.cc
echo "built $(pwd)/libcmaq_loader.so"
