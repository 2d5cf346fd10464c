#!/bin/bash
# End-to-end TTS demo on the Merlin slt_arctic corpus
# (reference tts_demo.sh:1-80 recipe).
#
# usage: ./tts_demo.sh <experiment_id> <slt_arctic_full_data_root>
# The data root must contain wav/, label_state_align/ and a Merlin question
# set; point hparams question_path at it via HPARAMS_EXTRA if nonstandard.

set -e

if [ $# -lt 2 ]; then
    echo "usage: $0 <experiment_id> <slt_arctic_full_data_root>"
    exit 1
fi

EXP_ID=$1
DATA_ROOT=$2
PYTHON=${PYTHON:-python}
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"

DURATION_EPOCHS=${DURATION_EPOCHS:-100}
ACOUSTIC_EPOCHS=${ACOUSTIC_EPOCHS:-50}
G_WARMUP=${G_WARMUP:-10}
D_WARMUP=${D_WARMUP:-5}
HPARAMS_EXTRA=${HPARAMS_EXTRA:-}
# At demo scale (~a few hundred utterances) export W_D=0.2 before running:
# the production stage-5 weight W_D=1.0 (train_gan.sh default, reference
# semantics) needs slt_arctic-scale data — at 250 utts it trades too much
# MCD for texture.  Measured through the full dossier pipeline
# (docs/tts_gan_sweep.json dossier_* rows): 0.2 passes every gate with
# margin (deficit 0.776x, MCD x1.24, GV 0.99->1.02) while 0.3 trips the
# MCD blow-up bound (x1.38).  train_gan.sh inherits W_D from env.

DATA_DIR=data/slt_arctic_tts_$EXP_ID
CKPT=checkpoints/tts_$EXP_ID

# 1. Feature extraction (linguistic/duration/acoustic)
$PYTHON $SCRIPT_DIR/prepare_features_tts.py $DATA_ROOT --dst_dir=$DATA_DIR

# 2. Duration model (MGE) then acoustic model (GAN curriculum)
bash $SCRIPT_DIR/train_gan.sh tts_duration "$HPARAMS_EXTRA" \
    $DATA_DIR/X_duration $DATA_DIR/Y_duration $CKPT/duration \
    $G_WARMUP $D_WARMUP $DURATION_EPOCHS $DURATION_EPOCHS

bash $SCRIPT_DIR/train_gan.sh tts_acoustic "$HPARAMS_EXTRA" \
    $DATA_DIR/X_acoustic $DATA_DIR/Y_acoustic $CKPT/acoustic \
    $G_WARMUP $D_WARMUP $ACOUSTIC_EPOCHS $ACOUSTIC_EPOCHS

# 3. Synthesize: baseline vs GAN
for kind in baseline gan; do
    $PYTHON $SCRIPT_DIR/evaluation_tts.py --post-filter --workers=${EVAL_WORKERS:-4} \
        --hparams_acoustic="$HPARAMS_EXTRA" \
        --hparams_duration="$HPARAMS_EXTRA" \
        $CKPT/acoustic/$kind/checkpoint_epoch${ACOUSTIC_EPOCHS}_Generator.pth \
        $CKPT/duration/$kind/checkpoint_epoch${DURATION_EPOCHS}_Generator.pth \
        $DATA_DIR $DATA_ROOT/label_state_align \
        generated/tts_${EXP_ID}_$kind
done

echo "tts_demo: wavs in generated/tts_${EXP_ID}_{baseline,gan}/{eval,test}"
