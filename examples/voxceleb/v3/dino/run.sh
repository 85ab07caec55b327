#!/bin/bash
# VoxCeleb v3 DINO SSL recipe (reference examples/voxceleb/v3/dino/run.sh):
# label-free pretraining, then extraction with the averaged teacher and
# cosine scoring. Fine-tuning on labels = cnceleb/v3_finetune pattern with
# model_init pointed at the averaged checkpoint.
set -e
. "$(dirname "$0")/../../../parse_options.sh" "$@"

stage=${stage:-1}
stop_stage=${stop_stage:-4}
data=${data:-data}
exp=${exp:-exp/dino_ecapa_c512}
config=${config:-conf/ecapa_dino.yaml}
trials="$data/vox1/trials/vox1-O.kaldi"

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  bash "$(dirname "$0")/../../v2/run.sh" --stage 1 --stop_stage 2 --data $data
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: DINO pretraining (multi-crop, EMA teacher) ==="
  python -m wespeaker_tpu.bin.train_dino --config $config \
    exp_dir=$exp data_type=shard \
    train_data=$data/vox2_dev/shard.list utt2spk=$data/vox2_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: average teacher + extract ==="
  python -m wespeaker_tpu.bin.average_model \
    --src_path $exp/models --dst_model $exp/models/avg_model.ckpt --num 10
  for dset in vox2_dev vox1; do
    python -m wespeaker_tpu.bin.extract --config $exp/config.yaml \
      --checkpoint $exp/models/avg_model.ckpt \
      --data_list $data/$dset/raw.list --out_prefix $exp/embeddings/$dset \
      --batch_size 32
  done
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: cosine scoring ==="
  mkdir -p $exp/mean && cp $exp/embeddings/vox2_dev.scp $exp/mean/xvector.scp
  python -m wespeaker_tpu.bin.score --exp_dir $exp \
    --eval_scp_path $exp/embeddings/vox1.scp --cal_mean_dir $exp/mean $trials
  python -m wespeaker_tpu.bin.compute_metrics \
    $exp/scores/$(basename $trials).score
fi
