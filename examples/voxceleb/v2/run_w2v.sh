#!/bin/bash
# w2v-bert 2.0 + adapter-MFA 3-stage recipe (reference run_w2v.sh):
#   stage 1: frozen frontend, 15 epochs (head-only; the reference adds LoRA
#            on the frozen base — utils/lora.py provides the JAX equivalent)
#   stage 2: joint fine-tune, 4 epochs
#   stage 3: joint large-margin fine-tune, 2 epochs (6s chunks, margin 0.5)
# The frontend is the flax w2v-bert port (frontend/w2vbert.py, torch-parity
# tested); features are the SeamlessM4T stacked fbank computed on device.
set -e
. "$(dirname "$0")/../../parse_options.sh" "$@"

stage=${stage:-1}
stop_stage=${stop_stage:-3}
data=${data:-data}
exp=${exp:-exp/w2vbert_mfa}
model_init=${model_init:-}   # converted w2v-bert-2.0 weights

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  bash "$(dirname "$0")/run.sh" --stage 1 --stop_stage 2 --data $data
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 1: frozen frontend ==="
  python -m wespeaker_tpu.bin.train --config conf/w2vbert_s1.yaml \
    exp_dir=${exp}_s1 data_type=shard \
    train_data=$data/vox2_dev/shard.list utt2spk=$data/vox2_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    ${model_init:+model_init=$model_init}
  python -m wespeaker_tpu.bin.average_model \
    --src_path ${exp}_s1/models --dst_model ${exp}_s1/models/avg_model.ckpt \
    --num 3

  echo "=== stage 2: joint fine-tune ==="
  python -m wespeaker_tpu.bin.train --config conf/w2vbert_s1.yaml \
    exp_dir=${exp}_s2 data_type=shard num_epochs=4 \
    dataset_args.w2vbert_args.frozen=false \
    train_data=$data/vox2_dev/shard.list utt2spk=$data/vox2_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    model_init=${exp}_s1/models/avg_model.ckpt \
    scheduler_args.initial_lr=0.0001 scheduler_args.final_lr=0.00001 \
    margin_scheduler_args.initial_margin=0.2 \
    margin_scheduler_args.increase_start_epoch=1 \
    margin_scheduler_args.fix_start_epoch=1

  echo "=== stage 3: joint large-margin fine-tune ==="
  python -m wespeaker_tpu.bin.train --config conf/w2vbert_s1.yaml \
    exp_dir=$exp data_type=shard num_epochs=2 \
    dataset_args.w2vbert_args.frozen=false \
    dataset_args.num_frms=600 dataset_args.batch_size=32 \
    train_data=$data/vox2_dev/shard.list utt2spk=$data/vox2_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    model_init=${exp}_s2/models/model_3.ckpt \
    scheduler_args.initial_lr=0.00005 scheduler_args.final_lr=0.00001 \
    margin_scheduler_args.initial_margin=0.5 \
    margin_scheduler_args.final_margin=0.5 \
    margin_scheduler_args.increase_start_epoch=1 \
    margin_scheduler_args.fix_start_epoch=1
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== extract + score (shared v2 stages) ==="
  python -m wespeaker_tpu.bin.average_model \
    --src_path $exp/models --dst_model $exp/models/avg_model.ckpt --num 1
  bash "$(dirname "$0")/run.sh" --stage 4 --stop_stage 7 --data $data \
    --exp $exp --config conf/w2vbert_s1.yaml
fi
