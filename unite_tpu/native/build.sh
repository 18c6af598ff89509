#!/usr/bin/env bash
# Build the native video decoder (libunite_videodec.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 videodec.cpp \
  -lavformat -lavcodec -lavutil -lswscale \
  -o libunite_videodec.so
echo "built $(pwd)/libunite_videodec.so"
