#!/bin/bash
# End-to-end voice conversion demo: CMU ARCTIC clb -> slt
# (reference vc_demo.sh:1-56 recipe).
#
# usage: ./vc_demo.sh <experiment_id> <cmu_arctic_root>
# <cmu_arctic_root> must contain cmu_us_clb_arctic/ and cmu_us_slt_arctic/.

set -e

if [ $# -lt 2 ]; then
    echo "usage: $0 <experiment_id> <cmu_arctic_root>"
    exit 1
fi

EXP_ID=$1
DATA_ROOT=$2
PYTHON=${PYTHON:-python}
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"

MAX_FILES=${MAX_FILES:-500}
HPARAMS_EXTRA=${HPARAMS_EXTRA:-}
TOTAL_EPOCH=${TOTAL_EPOCH:-200}
G_WARMUP=${G_WARMUP:-50}
D_WARMUP=${D_WARMUP:-10}

DATA_DIR=data/cmu_arctic_vc_$EXP_ID
CKPT=checkpoints/vc_$EXP_ID

# 1. Feature extraction (WORLD mgc + DTW alignment)
$PYTHON $SCRIPT_DIR/prepare_features_vc.py $DATA_ROOT clb slt \
    --max_files=$MAX_FILES --dst_dir=$DATA_DIR

# 2. 5-stage GAN curriculum
bash $SCRIPT_DIR/train_gan.sh vc "$HPARAMS_EXTRA" $DATA_DIR/X $DATA_DIR/Y $CKPT \
    $G_WARMUP $D_WARMUP $TOTAL_EPOCH $TOTAL_EPOCH

# 3. Synthesize evaluation + test sets, baseline vs GAN, DIFFVC mode
for kind in baseline gan; do
    $PYTHON $SCRIPT_DIR/evaluation_vc.py --diffvc --workers=${EVAL_WORKERS:-4} \
        --hparams="$HPARAMS_EXTRA" \
        $CKPT/$kind/checkpoint_epoch${TOTAL_EPOCH}_Generator.pth \
        $DATA_DIR $DATA_ROOT/cmu_us_clb_arctic/wav \
        generated/vc_${EXP_ID}_$kind
done

echo "vc_demo: wavs in generated/vc_${EXP_ID}_{baseline,gan}/{eval,test}"
