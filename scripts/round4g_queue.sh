#!/bin/bash
# Round-4 seventh chip queue — localize the composed-pipeline overhead.
# PERF.md's ceiling section attributes the ~2.4 ms/batch between the
# zero-overhead stage sum (27.3 ms -> 4,685 fps) and the measured composed
# pipeline (29.7 ms -> 4,311.6 fps) to "conversion/normalize/bookkeeping
# plus inter-stage layout moves" — qualitatively. This queue runs the
# cumulative-prefix profiler so adjacent differences pin the overhead to a
# stage boundary, making it fixable (or provably irreducible).
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 (round4f_queue.sh) to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [T] composed-pipeline prefix profile (rgbd, batch 128) ==="
timeout 3600 python scripts/profile_pipeline_prefix.py 128 rgbd \
  >parity/logs/prefix_rgbd_r4g.log 2>&1
echo "--- prefix rgbd (exit $?)"

echo "=== [U] composed-pipeline prefix profile (rgb, batch 128) ==="
timeout 3600 python scripts/profile_pipeline_prefix.py 128 rgb \
  >parity/logs/prefix_rgb_r4g.log 2>&1
echo "--- prefix rgb (exit $?)"
echo "=== round4g queue complete ==="
