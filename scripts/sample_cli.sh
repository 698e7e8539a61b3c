#!/bin/bash
# Pose-conditioned sampling CLI (reference: scripts/sample_sgl_14Bsc_xc_cli.sh)
script_dir=$(cd "$(dirname "$0")/.." && pwd)
cd "$script_dir"

run_cmd="python -m scail_tpu.cli.sample_video \
  --base configs/video_model/scail_14b.yaml configs/sampling/pose_cli.yaml \
  --seed $RANDOM"

echo "$run_cmd"
eval "$run_cmd"
echo "DONE on $(hostname)"
