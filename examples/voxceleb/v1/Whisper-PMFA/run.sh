#!/bin/bash
# Whisper-PMFA recipe (reference examples/voxceleb/v1/Whisper-PMFA/run.sh):
# whisper-large-v2 encoder frontend (layers 16-23 concatenated) + PMFA head,
# two-phase training on VoxCeleb1 — frozen frontend, then joint fine-tune —
# followed by extraction, cosine scoring, and AS-Norm.
#
# The frontend runs inside the jitted train step: raw wav -> whisper log-mel
# (device DSP) -> encoder (model-axis shardable) -> CMVN -> PMFA head.
# Initialize from a converted whisper checkpoint with model_init= (convert
# the torch release with wespeaker_tpu.utils.torch_compat).
set -e
. "$(dirname "$0")/../../../parse_options.sh" "$@"

stage=${stage:-1}
stop_stage=${stop_stage:-4}
data=${data:-data}
exp=${exp:-exp/whisper_pmfa}
config=${config:-conf/whisper_pmfa_stage1.yaml}
config2=${config2:-conf/whisper_pmfa_stage2.yaml}
model_init=${model_init:-}   # converted whisper-large-v2 encoder weights
trials="$data/vox1/trials/vox1-O.kaldi"

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: data lists ==="
  python -m wespeaker_tpu.bin.prep_data shard \
    --wav_scp $data/vox1_dev/wav.scp --utt2spk $data/vox1_dev/utt2spk \
    --shards_dir $data/vox1_dev/shards --shards_list $data/vox1_dev/shard.list \
    --num_utts_per_shard 1000 --num_threads 16
  python -m wespeaker_tpu.bin.prep_data raw \
    --wav_scp $data/vox1/wav.scp --utt2spk $data/vox1/utt2spk \
    --out_list $data/vox1/raw.list
  python -m wespeaker_tpu.bin.prep_data aug_store \
    --wav_scp $data/musan/wav.scp --out_prefix $data/musan/store
  python -m wespeaker_tpu.bin.prep_data aug_store \
    --wav_scp $data/rirs/wav.scp --out_prefix $data/rirs/store
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: phase-1 train (frozen whisper encoder) ==="
  python -m wespeaker_tpu.bin.train --config $config \
    exp_dir=${exp}_s1 data_type=shard \
    train_data=$data/vox1_dev/shard.list utt2spk=$data/vox1_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    ${model_init:+model_init=$model_init}
  echo "=== phase-2 train (joint fine-tune) ==="
  python -m wespeaker_tpu.bin.train --config $config2 \
    exp_dir=$exp data_type=shard \
    train_data=$data/vox1_dev/shard.list utt2spk=$data/vox1_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    model_init=${exp}_s1/models/avg_model.ckpt
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: extract ==="
  python -m wespeaker_tpu.bin.average_model \
    --src_path $exp/models --dst_model $exp/models/avg_model.ckpt --num 1
  for dset in vox1_dev vox1; do
    python -m wespeaker_tpu.bin.prep_data raw \
      --wav_scp $data/$dset/wav.scp --utt2spk $data/$dset/utt2spk \
      --out_list $data/$dset/raw.list
    python -m wespeaker_tpu.bin.extract --config $exp/config.yaml \
      --checkpoint $exp/models/avg_model.ckpt \
      --data_list $data/$dset/raw.list --out_prefix $exp/embeddings/$dset \
      --batch_size 8
  done
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: cosine + AS-Norm ==="
  mkdir -p $exp/mean && cp $exp/embeddings/vox1_dev.scp $exp/mean/xvector.scp
  python -m wespeaker_tpu.bin.score --exp_dir $exp \
    --eval_scp_path $exp/embeddings/vox1.scp --cal_mean_dir $exp/mean $trials
  python -m wespeaker_tpu.bin.compute_metrics \
    $exp/scores/$(basename $trials).score
  python -m wespeaker_tpu.bin.score_norm --score_norm_method asnorm \
    --top_n 300 --trial_score_file $exp/scores/$(basename $trials).score \
    --score_norm_file $exp/scores/$(basename $trials).asnorm \
    --cohort_emb_scp $exp/embeddings/vox1_dev.scp \
    --eval_emb_scp $exp/embeddings/vox1.scp \
    --mean_vec_path $exp/mean/mean_vec.npy
  python -m wespeaker_tpu.bin.compute_metrics \
    $exp/scores/$(basename $trials).asnorm
fi
