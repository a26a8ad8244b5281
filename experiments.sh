#!/usr/bin/env bash
# Full experiment grid of the benchmark (reference: experiments.sh),
# expressed against the vtm CLIs. Uncomment / select blocks to run.
# Substitute checkpoints + data paths in configs/ first.
#
# Roughly-optimal r per model (paper): ViViT 300, VideoMAE 150,
# TimeSformer 18, Motionformer 18. Max r: ViViT 392, VideoMAE 196,
# TimeSformer/Motionformer 24 (per-frame).
set -e

RUN="python tools/run_net.py"
BENCH="python tools/model_benchmark.py"
DSETS="kinetics ssv2 epickitchens"

cfg() {  # cfg <model> <dataset>
  case "$1/$2" in
    vivit/*)         echo configs/vivit/$2/tome_vivit_8x32_224.yaml ;;
    videomae/*)      echo configs/videomae/$2/tome_VideoMAE_B_16_224_*.yaml ;;
    timesformer/kinetics) echo configs/timesformer/kinetics/tome_TimeSformer_divST_8x32_224.yaml ;;
    timesformer/*)   echo configs/timesformer/$2/tome_TimeSformer_divST_8_224.yaml ;;
    motionformer/*)  echo configs/motionformer/$2/tome_motionformer_224_16x4.yaml ;;
  esac
}

baselines() {  # accuracy + throughput without merging
  for m in vivit videomae timesformer motionformer; do
    for d in $DSETS; do
      echo $RUN --cfg $(cfg $m $d) --opts TRAIN.ENABLE False TOME.ENABLE False
      echo $BENCH --cfg $(cfg $m $d) --opts TOME.ENABLE False MODEL_BENCHMARK.ITERATIONS 100 TEST.BATCH_SIZE 8
    done
  done
}

merging_sweep() {  # max / 25% / 12.5% / 6.25% / optimal constant-r
  declare -A RS=( [vivit]="392 98 49 25 300" [videomae]="196 49 25 12 150"
                  [timesformer]="24 6 3 2 18" [motionformer]="24 6 3 2 18" )
  for m in "${!RS[@]}"; do
    for d in $DSETS; do
      for r in ${RS[$m]}; do
        echo $RUN --cfg $(cfg $m $d) --opts TRAIN.ENABLE False TOME.R_VALUE $r
        echo $BENCH --cfg $(cfg $m $d) --opts TOME.R_VALUE $r MODEL_BENCHMARK.ITERATIONS 100 TEST.BATCH_SIZE 8
      done
    done
  done
}

schedules() {  # decreasing (-1) / increasing (+1) r schedules at optimal r
  for sched in -1 1; do
    echo $RUN --cfg $(cfg vivit kinetics)        --opts TRAIN.ENABLE False TOME.R_VALUE 300 TOME.SCHEDULE $sched
    echo $RUN --cfg $(cfg videomae kinetics)     --opts TRAIN.ENABLE False TOME.R_VALUE 150 TOME.SCHEDULE $sched
    echo $RUN --cfg $(cfg timesformer kinetics)  --opts TRAIN.ENABLE False TOME.R_VALUE 18 TOME.SCHEDULE $sched
    echo $RUN --cfg $(cfg motionformer kinetics) --opts TRAIN.ENABLE False TOME.R_VALUE 18 TOME.SCHEDULE $sched
  done
}

ablations() {  # concat head-agg, drop, random drop/merge
  echo $RUN --cfg $(cfg vivit kinetics)    --opts TRAIN.ENABLE False TOME.R_VALUE 300 TOME.HEAD_AGGREGATION concat
  echo $RUN --cfg $(cfg videomae kinetics) --opts TRAIN.ENABLE False TOME.R_VALUE 150 TOME.HEAD_AGGREGATION concat
  for mode in drop random_drop random_merge; do
    echo $RUN --cfg $(cfg vivit kinetics)    --opts TRAIN.ENABLE False TOME.R_VALUE 300 TOME.MODE $mode
    echo $RUN --cfg $(cfg videomae kinetics) --opts TRAIN.ENABLE False TOME.R_VALUE 150 TOME.MODE $mode
  done
}

duplicated_layers() {  # layer 0 / 11 duplicated x12
  for layer in 0 11; do
    echo $RUN --cfg $(cfg vivit kinetics)    --opts TRAIN.ENABLE False TOME.R_VALUE 262 TOME.LAYER_TO_DUPLICATE $layer TOME.LAYER_QUANTITY 12
    echo $RUN --cfg $(cfg videomae kinetics) --opts TRAIN.ENABLE False TOME.R_VALUE 131 TOME.LAYER_TO_DUPLICATE $layer TOME.LAYER_QUANTITY 12
  done
}

hybrid() {  # hybrid drop+merge at thresholds 0.4 / 0.8
  for thr in 0.4 0.8; do
    echo $RUN --cfg $(cfg vivit kinetics)    --opts TRAIN.ENABLE False TOME.R_VALUE 300 TOME.MODE hybrid TOME.THRESHOLD $thr
    echo $RUN --cfg $(cfg videomae kinetics) --opts TRAIN.ENABLE False TOME.R_VALUE 150 TOME.MODE hybrid TOME.THRESHOLD $thr
  done
}

accuracy_time_curves() {  # multi-view sweep (NUM_TEMPORAL_CLIPS -1 = [1,3,5,7,10])
  for m in vivit videomae timesformer motionformer; do
    echo $RUN --cfg $(cfg $m kinetics) --opts TRAIN.ENABLE False TEST.NUM_ENSEMBLE_VIEWS -1
  done
}

confusion_matrices() {
  for m in vivit videomae; do
    echo $RUN --cfg $(cfg $m kinetics) --opts TRAIN.ENABLE False \
      TENSORBOARD.ENABLE True TENSORBOARD.CONFUSION_MATRIX.ENABLE True
  done
}

finetune() {  # train-through-merging (EPIC)
  echo $RUN --cfg configs/videomae/epickitchens/tome_train_VideoMAE_B_16_224_EPICKITCHENS.yaml --opts TOME.R_VALUE 150
  echo $RUN --cfg configs/vivit/epickitchens/tome_train_vivit_8x32_224.yaml --opts TOME.R_VALUE 300
  echo $RUN --cfg configs/timesformer/epickitchens/tome_train_TimeSformer_divST_8_224.yaml --opts TOME.R_VALUE 18
}

# Print the selected grid (pipe to bash to execute):
#   ./experiments.sh baselines | bash
"${@:-baselines}"
