#!/bin/sh
# Build the pure-C++ PJRT loader.  The only dependency beyond g++/libdl is
# the single-header PJRT C API, shipped inside any tensorflow (or jaxlib
# source) wheel — auto-discovered below, or pass PJRT_INCLUDE explicitly:
#   PJRT_INCLUDE=/path/containing/xla/pjrt/c ./build.sh
set -e
cd "$(dirname "$0")"

if [ -z "$PJRT_INCLUDE" ]; then
  PJRT_INCLUDE=$(python3 - <<'EOF'
import os
try:
    import tensorflow
    inc = os.path.join(os.path.dirname(tensorflow.__file__), "include")
    if os.path.exists(os.path.join(inc, "xla/pjrt/c/pjrt_c_api.h")):
        print(inc)
except Exception:
    pass
EOF
)
fi
if [ -z "$PJRT_INCLUDE" ]; then
  echo "error: set PJRT_INCLUDE to a dir containing xla/pjrt/c/pjrt_c_api.h" >&2
  exit 1
fi

g++ -O2 -std=c++17 -I"$PJRT_INCLUDE" pjrt_loader.cc -ldl -o pjrt_loader
echo "built ./pjrt_loader"
echo "run:   ./pjrt_loader <pjrt_plugin.so> artifact/"
echo "e.g.:  ./pjrt_loader /opt/axon/libaxon_pjrt.so artifact/   (this env's TPU)"
