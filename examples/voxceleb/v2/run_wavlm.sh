#!/bin/bash
# WavLM-Large + ECAPA 3-phase recipe (reference run_wavlm.sh):
#   phase 1: frozen WavLM frontend, 150 epochs
#   phase 2: joint fine-tune, 20 epochs (init from phase-1 average)
#   phase 3: joint large-margin fine-tune, 5 epochs (init from phase-2)
# The frontend is the flax WavLM port (frontend/wavlm.py, torch-parity
# tested) with the learned layer-weight Featurizer; it runs inside the
# jitted train step. Initialize phase 1 from a converted torch WavLM
# checkpoint (utils/torch_compat.fold_wavlm_weight_norm + rules_for).
set -e
. "$(dirname "$0")/../../parse_options.sh" "$@"

stage=${stage:-1}
stop_stage=${stop_stage:-4}
data=${data:-data}
exp=${exp:-exp/wavlm_ecapa}
model_init=${model_init:-}   # converted WavLM-Large weights (composite tree)

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  bash "$(dirname "$0")/run.sh" --stage 1 --stop_stage 2 --data $data
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== phase 1: frozen frontend ==="
  python -m wespeaker_tpu.bin.train --config conf/ecapa_wavlm_frozen.yaml \
    exp_dir=${exp}_s1 data_type=shard \
    train_data=$data/vox2_dev/shard.list utt2spk=$data/vox2_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    ${model_init:+model_init=$model_init}
  python -m wespeaker_tpu.bin.average_model \
    --src_path ${exp}_s1/models --dst_model ${exp}_s1/models/avg_model.ckpt \
    --num 10

  echo "=== phase 2: joint fine-tune ==="
  python -m wespeaker_tpu.bin.train --config conf/ecapa_wavlm_joint_ft.yaml \
    exp_dir=${exp}_s2 data_type=shard \
    train_data=$data/vox2_dev/shard.list utt2spk=$data/vox2_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    model_init=${exp}_s1/models/avg_model.ckpt
  python -m wespeaker_tpu.bin.average_model \
    --src_path ${exp}_s2/models --dst_model ${exp}_s2/models/avg_model.ckpt \
    --num 3

  echo "=== phase 3: joint large-margin fine-tune ==="
  python -m wespeaker_tpu.bin.train --config conf/ecapa_wavlm_joint_lmft.yaml \
    exp_dir=$exp data_type=shard \
    train_data=$data/vox2_dev/shard.list utt2spk=$data/vox2_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    model_init=${exp}_s2/models/avg_model.ckpt
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== extract + score (shared v2 stages) ==="
  python -m wespeaker_tpu.bin.average_model \
    --src_path $exp/models --dst_model $exp/models/avg_model.ckpt --num 1
  bash "$(dirname "$0")/run.sh" --stage 4 --stop_stage 7 --data $data \
    --exp $exp --config conf/ecapa_wavlm_joint_lmft.yaml
fi
