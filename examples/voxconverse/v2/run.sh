#!/bin/bash
# VoxConverse diarization recipe (reference examples/voxconverse/v2/run.sh
# equivalent). Expects data/<set>/wav.scp and the official reference RTTMs.
set -e
. "$(dirname "$0")/../../parse_options.sh" "$@"
stage=${stage:-1}
data=${data:-data}
exp=${exp:-exp/diar}
model_dir=${model_dir:-exp/ecapa_c512}   # any trained model dir
dset=${dset:-dev}

mkdir -p $exp
if [ $stage -le 1 ]; then
  echo "=== oracle SAD + diarization + DER (spectral) ==="
  python -m wespeaker_tpu.bin.diarize \
    --config $model_dir/config.yaml \
    --checkpoint $model_dir/models/avg_model.ckpt \
    --wav_scp $data/$dset/wav.scp \
    --sad_rttm $data/$dset/ref.rttm \
    --clusterer spectral \
    --out_rttm $exp/$dset.spectral.rttm \
    --ref_rttm $data/$dset/ref.rttm
fi
if [ $stage -le 2 ]; then
  echo "=== umap/PAHC clustering (native UMAP+HDBSCAN, no extra deps) ==="
  python -m wespeaker_tpu.bin.diarize \
    --config $model_dir/config.yaml \
    --checkpoint $model_dir/models/avg_model.ckpt \
    --wav_scp $data/$dset/wav.scp \
    --sad_rttm $data/$dset/ref.rttm \
    --clusterer umap \
    --out_rttm $exp/$dset.umap.rttm \
    --ref_rttm $data/$dset/ref.rttm
fi
