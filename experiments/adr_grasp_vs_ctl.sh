#!/bin/bash
# Grasp-excitation ADR vs 20-policy DR control, one seed, sequential on
# the single TPU tunnel (~70 min per arm; timeout bounds the wall clock,
# max_iterations does not bind). Usage: adr_grasp_vs_ctl.sh SEED
set -u
SEED="${1:?usage: adr_grasp_vs_ctl.sh SEED}"
cd "$(dirname "$0")/.."
CTL_CFG="$(mktemp /tmp/shadow_hand_grasp_ctl.XXXX.yaml)"
sed 's/modelClass: MDNN/modelClass: None/' \
  bayes_sim_ig_tpu/cfg/shadow_hand_grasp.yaml > "$CTL_CFG"
timeout 4200 python -m bayes_sim_ig_tpu.bayes_sim_main --task ShadowHand \
  --logdir "runs/shadowhand_grasp_s${SEED}" \
  --cfg_env bayes_sim_ig_tpu/cfg/shadow_hand_grasp.yaml \
  --max_iterations 300 --seed "$SEED" --headless \
  > "runs/grasp_s${SEED}.log" 2>&1
timeout 4200 python -m bayes_sim_ig_tpu.bayes_sim_main --task ShadowHand \
  --logdir "runs/shadowhand_drctl_s${SEED}" \
  --cfg_env "$CTL_CFG" \
  --max_iterations 300 --seed "$SEED" --headless \
  > "runs/drctl_s${SEED}.log" 2>&1
rm -f "$CTL_CFG"
echo "done seed ${SEED}"
