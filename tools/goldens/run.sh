#!/bin/sh
# Regenerate the committed golden vectors from the actual C++ reference.
# Requires /root/reference (read-only mount) and the vendored mdspan found
# inside the tensorflow/raft include tree (no network egress available).
set -e
cd "$(dirname "$0")/../.."

RAFT=/opt/venv/lib/python3.12/site-packages/tensorflow/include/external/raft/cpp/include/raft/thirdparty/mdspan/include

python tools/goldens/gen_inputs.py
g++ -std=c++20 -O2 \
    -Itools/goldens \
    -I"$RAFT" \
    -I/root/reference/src \
    tools/goldens/gen_goldens.cpp -o /tmp/gen_goldens
/tmp/gen_goldens tests/goldens
ls -la tests/goldens | head -30
