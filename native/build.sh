#!/bin/sh
# Build the native CMAQ data-plane library.
# Compile to a temp file and rename: the old .so may already be mapped into
# a running process (e.g. a stale-ABI rebuild), and truncating a mapped
# library in place corrupts it — rename gives the new build a fresh inode.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -pthread -std=c++17 -o libcmaq_loader.so.tmp cmaq_loader.cc
mv -f libcmaq_loader.so.tmp libcmaq_loader.so
echo "built $(pwd)/libcmaq_loader.so"
