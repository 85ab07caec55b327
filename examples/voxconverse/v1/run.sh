#!/bin/bash
# VoxConverse diarization recipe, v1 = spectral clustering only (reference
# examples/voxconverse/v1/run.sh). v2 adds the umap/PAHC clusterer and the
# dev/test partition switch; both share the same CLI here.
set -e
. "$(dirname "$0")/../../parse_options.sh" "$@"
stage=${stage:-1}
data=${data:-data}
exp=${exp:-exp/diar_v1}
model_dir=${model_dir:-exp/resnet34}      # any trained model dir
dset=${dset:-dev}

mkdir -p $exp
if [ $stage -le 1 ]; then
  echo "=== oracle SAD + sliding-window embeddings + spectral clustering ==="
  python -m wespeaker_tpu.bin.diarize \
    --config $model_dir/config.yaml \
    --checkpoint $model_dir/models/avg_model.ckpt \
    --wav_scp $data/$dset/wav.scp \
    --sad_rttm $data/$dset/ref.rttm \
    --clusterer spectral \
    --out_rttm $exp/$dset.rttm \
    --ref_rttm $data/$dset/ref.rttm
fi
