#!/bin/bash
# Unattended OpenCL A/B (round-4 VERDICT stretch item): on a machine
# WITH an OpenCL runtime, produce BASELINE.md's quality metric — pixel
# RMSE between this framework and the actual davawen/Simple-Raytracer —
# in one command.  Automates docs/AB_PARITY.md steps 1-6:
#
#   scripts/run_opencl_ab.sh <reference-checkout> <scene> [seconds]
#
#   <reference-checkout>  a clone of davawen/Simple-Raytracer (built or
#                         buildable: meson + boost + SDL2 + OpenCL)
#   <scene>               red_green | spheres | model
#   [seconds]             convergence time before the screenshot (300)
#
# Requires: meson+ninja toolchain for the reference, an X server or
# xvfb-run, and xdotool to press 'p' (the reference's screenshot key,
# src/main.cpp:319-322).  This environment has none of these — the
# script exists so the A/B is one command wherever they exist.
set -euo pipefail
REF=${1:?usage: run_opencl_ab.sh <reference-checkout> <scene> [seconds]}
SCENE=${2:?scene: red_green | spheres | model}
SECS=${3:-300}
HERE=$(cd "$(dirname "$0")/.." && pwd)
SNIP="$HERE/showcase/scenes/${SCENE}_scene.cpp"
[ -f "$SNIP" ] || { echo "no snippet $SNIP (run export_showcase_scenes.py)"; exit 1; }
for tool in meson ninja xdotool; do
  command -v $tool >/dev/null || { echo "missing: $tool"; exit 1; }
done
XVFB=""
[ -n "${DISPLAY:-}" ] || { command -v xvfb-run >/dev/null \
  && XVFB="xvfb-run -a" || { echo "no DISPLAY and no xvfb-run"; exit 1; }; }

# -- 1. splice the exported scene into main.cpp ------------------------
# (docs/AB_PARITY.md step 2: replace everything from the shapes
# declaration through the sun_direction assignment)
python3 - "$REF/src/main.cpp" "$SNIP" <<'EOF'
import re, sys
main_path, snip_path = sys.argv[1], sys.argv[2]
src = open(main_path).read()
snip = open(snip_path).read()
start = src.index("std::vector<Shape> shapes;")
m = re.search(r"^.*sun_direction\s*=.*$", src[start:], re.M)
assert m, "sun_direction assignment not found after shapes decl"
end = start + m.end()
open(main_path + ".orig", "w").write(src)
open(main_path, "w").write(src[:start] + snip + src[end:])
print(f"spliced {snip_path} into {main_path} (backup: main.cpp.orig)")
EOF
if [ "$SCENE" = model ]; then
  cp "$HERE/showcase/scenes/model_mesh0.obj" "$REF/"
fi

# -- 2. build + run the reference headless, screenshot after SECS ------
( cd "$REF"
  [ -d build ] || meson setup build
  ninja -C build
  rm -f screenshot.ppm
  $XVFB ./build/raytracer &
  APP=$!
  trap "kill $APP 2>/dev/null || true" EXIT
  sleep "$SECS"
  WIN=$(xdotool search --name . | head -1)
  xdotool key --window "$WIN" p   # PPM screenshot (main.cpp:319-322)
  sleep 5
  kill $APP 2>/dev/null || true
  [ -f screenshot.ppm ] || { echo "reference wrote no screenshot.ppm"; exit 1; }
)

# -- 3. render ours from the identical exported scene ------------------
# (the reference accumulates 2 spp/frame; match total spp by steps)
STEPS=$(( SECS * 20 ))   # ~20 fps of 2spp ~= 40 spp/s; close enough —
                         # both sides are converged estimators
python3 -m simple_raytracer_tpu.cli --scene \
  "$HERE/showcase/scenes/${SCENE}.json" --steps "$STEPS" \
  --out "/tmp/ab_${SCENE}_ours.png"

# -- 4. the BASELINE metric --------------------------------------------
python3 "$HERE/scripts/parity_rmse.py" \
  "/tmp/ab_${SCENE}_ours.png" "$REF/screenshot.ppm"
