#!/bin/bash
# 5-stage GAN training curriculum (reference train_gan.sh:1-108 semantics).
#
# Stages, handing state between processes purely via checkpoint files named
# checkpoint_epoch{N}_{Generator|Discriminator}.pth:
#   1. baseline     MGE-only full run             (--w_d=0)
#   2. G warmup     MGE-only short run            (--w_d=0)
#   3. D warmup     D trained vs frozen G         (--discriminator-warmup)
#   4. spoofing-D   optional reference D vs the baseline G
#   5. adversarial  joint GAN from both warmups   (--reset_optimizers,
#                   --restart_epoch=<g_warmup>, --checkpoint-r=<spoof D>)
#
# usage: train_gan.sh <hparams_name> <hparams_overrides> <inputs_dir> \
#        <outputs_dir> <checkpoint_dir> <generator_warmup_epoch> \
#        <discriminator_warmup_epoch> <spoofing_total_epoch> <total_epoch>

set -e

if [ $# -lt 9 ]; then
    echo "usage: $0 <hparams_name> <hparams> <inputs_dir> <outputs_dir> <checkpoint_dir> <g_warmup> <d_warmup> <spoof_epochs> <total>"
    exit 1
fi

HPARAMS_NAME=$1
HPARAMS=$2
INPUTS_DIR=$3
OUTPUTS_DIR=$4
CHECKPOINT_DIR=$5
GENERATOR_WARMUP_EPOCH=$6
DISCRIMINATOR_WARMUP_EPOCH=$7
SPOOFING_TOTAL_EPOCH=$8
TOTAL_EPOCH=$9

PYTHON=${PYTHON:-python}
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
TRAIN="$PYTHON $SCRIPT_DIR/train.py"

# Stage-5 adversarial weight (the reference hardcodes 1.0; the dynamic
# weight w_d * E(mge)/E(adv) is scaled by it — tools/tts_gan_sweep.py
# measures the sensible range on the dossier corpus)
W_D=${W_D:-1.0}

# Extra hparams applied to every stage that trains a discriminator (3, 4
# and 5 — D warmup, the optional spoofing reference D, and the joint
# adversarial stage; the baseline/G-warmup stay at the bundle defaults).
# Used to slow the discriminator on small corpora, e.g.
# ADV_HPARAMS="optimizer_d_params={'lr': 0.001, 'weight_decay': 1e-7}"
# (tools/tts_gan_sweep.py measures the effect).
ADV_HPARAMS=${ADV_HPARAMS:-}
adv_hp() { if [ -n "$ADV_HPARAMS" ]; then echo "$1,$ADV_HPARAMS"; else echo "$1"; fi; }

# Stage flags (mirror reference train_gan.sh:33-38)
RUN_BASELINE=${RUN_BASELINE:-1}
RUN_GENERATOR_WARMUP=${RUN_GENERATOR_WARMUP:-1}
RUN_DISCRIMINATOR_WARMUP=${RUN_DISCRIMINATOR_WARMUP:-1}
RUN_SPOOFING_MODEL=${RUN_SPOOFING_MODEL:-0}
RUN_ADVERSARIAL=${RUN_ADVERSARIAL:-1}

# Checkpoint naming contract (reference train_gan.sh:40-44)
ckpt() { echo "$1/checkpoint_epoch$2_$3.pth"; }

# 1. Baseline (MGE only, full epochs)
if [ "$RUN_BASELINE" == 1 ]; then
    $TRAIN --hparams_name=$HPARAMS_NAME \
        --hparams="$HPARAMS,nepoch=$TOTAL_EPOCH" \
        --checkpoint-dir=$CHECKPOINT_DIR/baseline \
        --log-event-path=$CHECKPOINT_DIR/baseline/log \
        --w_d=0 --mge_w=1.0 \
        $INPUTS_DIR $OUTPUTS_DIR
fi

# 2. Generator warmup (MGE only)
if [ "$RUN_GENERATOR_WARMUP" == 1 ]; then
    $TRAIN --hparams_name=$HPARAMS_NAME \
        --hparams="$HPARAMS,nepoch=$GENERATOR_WARMUP_EPOCH" \
        --checkpoint-dir=$CHECKPOINT_DIR/gan \
        --log-event-path=$CHECKPOINT_DIR/gan/log \
        --w_d=0 --mge_w=1.0 \
        $INPUTS_DIR $OUTPUTS_DIR
fi

# 3. Discriminator warmup (G frozen, from the G-warmup checkpoint)
if [ "$RUN_DISCRIMINATOR_WARMUP" == 1 ]; then
    $TRAIN --hparams_name=$HPARAMS_NAME \
        --hparams="$(adv_hp "$HPARAMS,nepoch=$DISCRIMINATOR_WARMUP_EPOCH")" \
        --checkpoint-dir=$CHECKPOINT_DIR/gan \
        --checkpoint-g=$(ckpt $CHECKPOINT_DIR/gan $GENERATOR_WARMUP_EPOCH Generator) \
        --log-event-path=$CHECKPOINT_DIR/gan/log \
        --discriminator-warmup --w_d=1.0 --restart_epoch=0 \
        $INPUTS_DIR $OUTPUTS_DIR
fi

# 4. Optional spoofing reference discriminator (vs the baseline G)
if [ "$RUN_SPOOFING_MODEL" == 1 ]; then
    $TRAIN --hparams_name=$HPARAMS_NAME \
        --hparams="$(adv_hp "$HPARAMS,nepoch=$SPOOFING_TOTAL_EPOCH")" \
        --checkpoint-dir=$CHECKPOINT_DIR/spoofing_model \
        --log-event-path=$CHECKPOINT_DIR/spoofing_model/log \
        --checkpoint-g=$(ckpt $CHECKPOINT_DIR/baseline $TOTAL_EPOCH Generator) \
        --discriminator-warmup --w_d=1.0 --restart_epoch=0 \
        $INPUTS_DIR $OUTPUTS_DIR
    CHECKPOINT_R="--checkpoint-r=$(ckpt $CHECKPOINT_DIR/spoofing_model $SPOOFING_TOTAL_EPOCH Discriminator)"
else
    CHECKPOINT_R=""
fi

# 5. Joint adversarial training from both warmup checkpoints
if [ "$RUN_ADVERSARIAL" == 1 ]; then
    $TRAIN --hparams_name=$HPARAMS_NAME \
        --hparams="$(adv_hp "$HPARAMS,nepoch=$TOTAL_EPOCH")" \
        --checkpoint-dir=$CHECKPOINT_DIR/gan \
        --checkpoint-g=$(ckpt $CHECKPOINT_DIR/gan $GENERATOR_WARMUP_EPOCH Generator) \
        --checkpoint-d=$(ckpt $CHECKPOINT_DIR/gan $DISCRIMINATOR_WARMUP_EPOCH Discriminator) \
        --log-event-path=$CHECKPOINT_DIR/gan/log \
        --reset_optimizers --restart_epoch=$GENERATOR_WARMUP_EPOCH \
        --w_d=$W_D $CHECKPOINT_R \
        $INPUTS_DIR $OUTPUTS_DIR
fi

echo "train_gan.sh: all requested stages finished."
