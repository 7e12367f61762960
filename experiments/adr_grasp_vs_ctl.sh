#!/bin/bash
# Grasp-excitation ADR vs 20-policy DR control, one seed, sequential on
# the single TPU tunnel (~70 min per arm; timeout bounds the wall clock,
# max_iterations does not bind). Usage: adr_grasp_vs_ctl.sh SEED [EVALS]
# EVALS overrides bayessim.realEvals in both arms (default: the cfg's
# 100). 400 is free variance reduction: one 2048-env eval round already
# simulates >400 episodes, the override just widens the statistic.
set -u
SEED="${1:?usage: adr_grasp_vs_ctl.sh SEED [EVALS]}"
EVALS="${2:-}"
cd "$(dirname "$0")/.."
mkdir -p runs
GRASP_CFG="bayes_sim_ig_tpu/cfg/shadow_hand_grasp.yaml"
if [ -n "$EVALS" ]; then
  TUNED_CFG="$(mktemp /tmp/shadow_hand_grasp_e${EVALS}.XXXX.yaml)"
  sed "s/realEvals: 100/realEvals: ${EVALS}/" "$GRASP_CFG" > "$TUNED_CFG"
  GRASP_CFG="$TUNED_CFG"
fi
CTL_CFG="$(mktemp /tmp/shadow_hand_grasp_ctl.XXXX.yaml)"
sed 's/modelClass: MDNN/modelClass: None/' "$GRASP_CFG" > "$CTL_CFG"
timeout 4200 python -m bayes_sim_ig_tpu.bayes_sim_main --task ShadowHand \
  --logdir "runs/shadowhand_grasp_s${SEED}" \
  --cfg_env "$GRASP_CFG" \
  --max_iterations 300 --seed "$SEED" --headless \
  > "runs/grasp_s${SEED}.log" 2>&1
echo "grasp arm done seed ${SEED}"
timeout 4200 python -m bayes_sim_ig_tpu.bayes_sim_main --task ShadowHand \
  --logdir "runs/shadowhand_drctl_s${SEED}" \
  --cfg_env "$CTL_CFG" \
  --max_iterations 300 --seed "$SEED" --headless \
  > "runs/drctl_s${SEED}.log" 2>&1
rm -f "$CTL_CFG"
[ -n "$EVALS" ] && rm -f "$TUNED_CFG"
echo "done seed ${SEED}"
