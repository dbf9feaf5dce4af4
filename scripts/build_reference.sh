#!/bin/sh
# Build the C++ reference (riktor/safer2-recommender) WITHOUT network access:
# bazel cannot fetch Eigen/glog/fmt here (zero egress), so we compile
# directly against TensorFlow's bundled Eigen plus the minimal glog/fmt
# shims in scripts/ref_shims/. Used to measure the baselines in BASELINE.md.
set -e
OUT=${1:-/tmp/refbuild}
EIGEN=$(python - <<'PY'
import pathlib, tensorflow
print(pathlib.Path(tensorflow.__file__).parent / "include")
PY
)
mkdir -p "$OUT"
g++ -O3 -mavx2 -mfma -std=c++2a -DNDEBUG -DEIGEN_MPL2_ONLY \
  -I/root/reference/include -I/root/reference/tools \
  -I"$EIGEN" -I"$(dirname "$0")/ref_shims" \
  /root/reference/tools/run_model.cc -o "$OUT/run_model" -lpthread
echo "built $OUT/run_model"
