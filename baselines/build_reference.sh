#!/usr/bin/env bash
# Build the UPSTREAM reference solver (read-only at /root/reference) into a
# single-core baseline binary, using stub glog/gflags headers and the Eigen
# that ships inside the tensorflow wheel. GUI sources are excluded.
set -euo pipefail

REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="$HERE/build"
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
mkdir -p "$OUT/obj"

CXXFLAGS=(-std=c++17 -O3 -DNDEBUG
  -DILQGAMES_LOG_DIR='"/tmp/ilqgames_logs"'
  -I"$HERE/stubs" -I"$REF/include" -isystem "$EIGEN" -w)

srcs=()
for f in "$REF"/src/*.cpp; do
  base=$(basename "$f")
  case "$base" in
    control_sliders.cpp|cost_inspector.cpp|top_down_renderer.cpp) continue ;;
  esac
  srcs+=("$f")
done

pids=()
objs=()
for f in "${srcs[@]}"; do
  obj="$OUT/obj/$(basename "${f%.cpp}").o"
  objs+=("$obj")
  if [[ ! -f "$obj" || "$f" -nt "$obj" ]]; then
    g++ "${CXXFLAGS[@]}" -c "$f" -o "$obj" &
    pids+=($!)
    # Throttle to the core count.
    if (( ${#pids[@]} >= $(nproc) )); then wait "${pids[0]}"; pids=("${pids[@]:1}"); fi
  fi
done
wait

for main in "$HERE"/main_*.cpp; do
  bin="$OUT/$(basename "${main%.cpp}")"
  g++ "${CXXFLAGS[@]}" "$main" "${objs[@]}" -o "$bin"
  echo "built $bin"
done
