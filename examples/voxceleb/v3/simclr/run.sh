#!/bin/bash
# VoxCeleb v3 SimCLR SSL recipe (reference examples/voxceleb/v3/simclr):
# 2-view InfoNCE pretraining, then extraction + cosine scoring.
set -e
. "$(dirname "$0")/../../../parse_options.sh" "$@"

stage=${stage:-1}
stop_stage=${stop_stage:-4}
data=${data:-data}
exp=${exp:-exp/simclr_ecapa_c512}
config=${config:-conf/ecapa_simclr.yaml}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  bash "$(dirname "$0")/../../v2/run.sh" --stage 1 --stop_stage 2 --data $data
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: SimCLR pretraining ==="
  python -m wespeaker_tpu.bin.train_contrastive --config $config \
    ssl_method=simclr exp_dir=$exp data_type=shard \
    train_data=$data/vox2_dev/shard.list utt2spk=$data/vox2_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  bash "$(dirname "$0")/../dino/run.sh" --stage 3 --stop_stage 4 \
    --data $data --exp $exp --config $config
fi
