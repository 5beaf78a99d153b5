#!/usr/bin/env bash
# Quality north-star run (BASELINE.json: >=31 dB PSNR on a lego-class 400^2
# scene). No Blender data can exist in this environment (zero egress), so the
# procedural gaussian_blobs scene stands in at the reference's exact lego
# operating point: train at 400^2 (half-res contract), validate/render/score
# the DISJOINT test split at 800^2 — mirroring
# /root/reference/torch_nerf/runners/train.py:64-71 (val split, full res) and
# runners/render.py:44-45 (test split, full res).
#
# Drives the three real CLIs (run_train -> run_render -> evaluate), then
# writes QUALITY_r{N}.json at the repo root.
#
#   bash scripts/experiments/quality_northstar.sh [steps] [round]
set -euo pipefail
cd "$(dirname "$0")/../.."

STEPS="${1:-20000}"
ROUND="${2:-04}"
# CONFIG=instant_nerf runs the hash-grid model through the same protocol
CONFIG="${CONFIG:-default}"
VIEWS=16
# cadences are in EPOCHS (= STEPS/VIEWS steps each, reference semantics); val
# renders are 5 full 800^2 frames (~3.2M rays each pass), so ~10 validations
# over the run is the wall-time-sane default
VAL_EVERY="${3:-$(( STEPS / VIEWS / 10 ))}"
VIS_NEVER=$(( STEPS / VIEWS + 1 ))
# remaining args = extra dotted config overrides (e.g. occupancy.enabled=true),
# with a TAG to keep variant outputs apart
TAG="${4:-}"
shift $(( $# > 4 ? 4 : $# )) || true
EXTRA=("$@")
RUN=/tmp/quality_r${ROUND}${TAG}
GT=/tmp/quality_r${ROUND}${TAG}_gt
RENDER=/tmp/quality_r${ROUND}${TAG}_render
rm -rf "$RUN" "$GT" "$RENDER"

START=$(date +%s)
python -u -m torch_nerf_tpu.runners.run_train \
  --config "$CONFIG" --log-dir "$RUN" --max-steps "$STEPS" \
  data.dataset_type=gaussian_blobs data.img_size=400 data.num_views=$VIEWS \
  train_params.optim.num_iter="$STEPS" \
  train_params.validation.validate_every="$VAL_EVERY" \
  train_params.log.epoch_btw_ckpt="$VAL_EVERY" train_params.log.epoch_btw_vis="$VIS_NEVER" \
  ${EXTRA[@]+"${EXTRA[@]}"}
TRAIN_S=$(( $(date +%s) - START ))

python -u -m torch_nerf_tpu.runners.run_render \
  --log-dir "$RUN" --render-test-views --num-views 4 --out-dir "$RENDER"

# ground-truth test images (the analytic scene rendered at the same 800^2
# test poses run_render used — the procedural analogue of the dataset's
# test/*.png files)
python -u - "$RUN" "$GT" <<'EOF'
import sys
from pathlib import Path
from torch_nerf_tpu import config as cfg_mod, session
from torch_nerf_tpu.logging_utils import save_png

run, gt = Path(sys.argv[1]), Path(sys.argv[2])
cfg = cfg_mod.load_config(run / "config.yaml")
ds = session.build_dataset(cfg, split="test")
gt.mkdir(parents=True, exist_ok=True)
for i in range(4):
    save_png(gt / f"{i:04d}.png", ds.images[i])
EOF

python -u -m torch_nerf_tpu.runners.evaluate "$RENDER" "$GT" | tee /tmp/quality_eval.txt

python -u - "$STEPS" "$TRAIN_S" "$ROUND" "$TAG" <<'EOF'
import json, re, sys
from pathlib import Path

steps, train_s, rnd = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
tag = sys.argv[4] if len(sys.argv) > 4 else ""
eval_txt = Path("/tmp/quality_eval.txt").read_text()
metrics = {
    k.lower(): float(v)
    for k, v in re.findall(r"(PSNR|SSIM|LPIPS): ([0-9.]+)", eval_txt)
}
# the in-loop validation curve (val split @ 800^2) from the train log
curve = []
log = Path(f"/tmp/quality_r{rnd}{tag}") / "metrics.jsonl"
if log.exists():
    for line in log.read_text().splitlines():
        rec = json.loads(line)
        if "val/psnr" in rec:
            curve.append(
                {
                    "step": rec["step"],
                    "psnr": round(rec["val/psnr"], 3),
                    "wall_s": rec.get("wall_s"),
                }
            )
# the measured 31 dB crossing (validation-cadence granularity; wall_s
# includes the in-loop validation overhead, so it upper-bounds pure train)
crossing = next((c for c in curve if c["psnr"] >= 31.0), None)
out = {
    "north_star": ">=31 dB PSNR on a lego-class 400^2 scene (BASELINE.json)",
    "scene": "gaussian_blobs procedural (no Blender data in this env; "
    "disjoint train/val/test camera splits)",
    "protocol": "train 400^2 x 16 views (real train CLI) -> render 4 test "
    "views @ 800^2 (real render CLI) -> score vs analytic ground truth "
    "(real evaluate CLI)",
    "steps": steps,
    "train_wall_seconds": train_s,
    "test_metrics": metrics,
    "val_psnr_curve": curve,
    "time_to_31db_s": None if crossing is None else crossing["wall_s"],
    "crossing_step": None if crossing is None else crossing["step"],
    "achieved": metrics.get("psnr", 0.0) >= 31.0,
}
dest = Path(f"QUALITY_r{rnd}{tag}.json")
dest.write_text(json.dumps(out, indent=2) + "\n")
print(f"wrote {dest}: PSNR={metrics.get('psnr')}")
EOF
