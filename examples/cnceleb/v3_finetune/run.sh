#!/bin/bash
# CNCeleb v3_finetune — supervised fine-tuning of an SSL-pretrained backbone
# (reference examples/cnceleb/v3_finetune/run.sh): identical staging to
# cnceleb/v2 but training starts from `model_init` (the averaged DINO
# teacher from voxceleb/v3) with a freshly initialized margin head.
set -e
. "$(dirname "$0")/../../parse_options.sh" "$@"

stage=${stage:-1}
stop_stage=${stop_stage:-5}
data=${data:-data}
exp=${exp:-exp/ecapa_c1024_ft_dino}
config=${config:-conf/ecapa_tdnn_ft.yaml}
model_init=${model_init:?"set model_init=path/to/ssl avg_model.ckpt"}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  bash "$(dirname "$0")/../v2/run.sh" --stage 1 --stop_stage 1 --data $data
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: fine-tune from SSL init ==="
  python -m wespeaker_tpu.bin.train --config $config \
    exp_dir=$exp data_type=shard \
    train_data=$data/cnceleb_train/shard.list \
    utt2spk=$data/cnceleb_train/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    model_init=$model_init
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  bash "$(dirname "$0")/../v2/run.sh" --stage 3 --stop_stage 5 \
    --data $data --exp $exp --config $config
fi
