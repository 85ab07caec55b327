#!/bin/bash
# VoxCeleb v2 recipe for wespeaker-tpu — the staged-pipeline equivalent of
# the reference examples/voxceleb/v2/run.sh. Expects standard kaldi-style
# prep outputs (wav.scp + utt2spk per set, MUSAN/RIR wav.scp) under data/.
set -e
. "$(dirname "$0")/../../parse_options.sh" "$@"

stage=${stage:-1}
stop_stage=${stop_stage:-9}
data=${data:-data}
exp=${exp:-exp/ecapa_c512}
config=${config:-conf/ecapa_tdnn_c512.yaml}
lm_config=${lm_config:-conf/ecapa_tdnn_lm.yaml}
num_avg=${num_avg:-10}
checkpoint=${checkpoint:-}
nj=${nj:-1}
trials="$data/vox1/trials/vox1-O.kaldi"

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: data lists (shards + raw) ==="
  python -m wespeaker_tpu.bin.prep_data shard \
    --wav_scp $data/vox2_dev/wav.scp --utt2spk $data/vox2_dev/utt2spk \
    --shards_dir $data/vox2_dev/shards --shards_list $data/vox2_dev/shard.list \
    --num_utts_per_shard 1000 --num_threads 16
  for dset in vox1; do
    python -m wespeaker_tpu.bin.prep_data raw \
      --wav_scp $data/$dset/wav.scp --utt2spk $data/$dset/utt2spk \
      --out_list $data/$dset/raw.list
  done
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: MUSAN / RIR packed aug stores ==="
  python -m wespeaker_tpu.bin.prep_data aug_store \
    --wav_scp $data/musan/wav.scp --out_prefix $data/musan/store
  python -m wespeaker_tpu.bin.prep_data aug_store \
    --wav_scp $data/rirs/wav.scp --out_prefix $data/rirs/store
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: train (mesh DP over all local chips) ==="
  python -m wespeaker_tpu.bin.train --config $config \
    exp_dir=$exp data_type=shard \
    train_data=$data/vox2_dev/shard.list utt2spk=$data/vox2_dev/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    ${checkpoint:+checkpoint=$checkpoint}
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: average checkpoints + extract embeddings ==="
  python -m wespeaker_tpu.bin.average_model \
    --src_path $exp/models --dst_model $exp/models/avg_model.ckpt \
    --num $num_avg
  model_path=$exp/models/avg_model.ckpt
  # reference run.sh:89-96 — fold RepVGG train branches for deployment
  if [[ $config == *repvgg*.yaml ]]; then
    echo "convert repvgg model ..."
    python -m wespeaker_tpu.bin.convert_repvgg \
      --config $exp/config.yaml \
      --checkpoint $model_path \
      --save_path $exp/models/convert_model.ckpt
    model_path=$exp/models/convert_model.ckpt
  fi
  for dset in vox2_dev vox1; do
    python -m wespeaker_tpu.bin.extract --config $exp/config.yaml \
      --checkpoint $model_path \
      --data_list $data/$dset/raw.list --out_prefix $exp/embeddings/$dset \
      --batch_size 32
  done
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "=== stage 5: cosine scoring + EER/minDCF ==="
  mkdir -p $exp/mean && cp $exp/embeddings/vox2_dev.scp $exp/mean/xvector.scp
  python -m wespeaker_tpu.bin.score --exp_dir $exp \
    --eval_scp_path $exp/embeddings/vox1.scp --cal_mean_dir $exp/mean $trials
  python -m wespeaker_tpu.bin.compute_metrics \
    $exp/scores/$(basename $trials).score
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  echo "=== stage 6: AS-Norm ==="
  python -m wespeaker_tpu.bin.score_norm --score_norm_method asnorm \
    --top_n 300 --trial_score_file $exp/scores/$(basename $trials).score \
    --score_norm_file $exp/scores/$(basename $trials).asnorm \
    --cohort_emb_scp $exp/embeddings/vox2_dev.scp \
    --eval_emb_scp $exp/embeddings/vox1.scp \
    --mean_vec_path $exp/mean/mean_vec.npy
  python -m wespeaker_tpu.bin.compute_metrics \
    $exp/scores/$(basename $trials).asnorm
fi

if [ $stage -le 7 ] && [ $stop_stage -ge 7 ]; then
  echo "=== stage 7: QMF calibration ==="
  python -m wespeaker_tpu.bin.prep_data wav2dur \
    --wav_scp $data/vox1/wav.scp --out $data/vox1/utt2dur
  python -m wespeaker_tpu.bin.score_calibration train \
    --score_norm_file $exp/scores/$(basename $trials).asnorm \
    --save_model_path $exp/qmf.npz --wav_dur_scp $data/vox1/utt2dur
  python -m wespeaker_tpu.bin.score_calibration infer \
    --score_norm_file $exp/scores/$(basename $trials).asnorm \
    --model_path $exp/qmf.npz --wav_dur_scp $data/vox1/utt2dur \
    --out_score_file $exp/scores/$(basename $trials).qmf
  python -m wespeaker_tpu.bin.compute_metrics \
    $exp/scores/$(basename $trials).qmf
fi

if [ $stage -le 8 ] && [ $stop_stage -ge 8 ]; then
  echo "=== stage 8: export the best model (reference run.sh:139-145) ==="
  python -m wespeaker_tpu.bin.export_model \
    --config $exp/config.yaml \
    --checkpoint $exp/models/avg_model.ckpt \
    --output_model $exp/models/final.stablehlo \
    --mean_vec $exp/mean/mean_vec.npy
fi

if [ $stage -le 9 ] && [ $stop_stage -ge 9 ]; then
  echo "=== stage 9: large-margin fine-tune re-run (run.sh:147-163) ==="
  lm_exp=${exp}-LM
  # initialize from the averaged model; the tolerant checkpoint loader
  # keeps the speed-perturbed 3x classifier rows (do_lm truncation)
  bash "$0" --stage 3 --stop_stage 8 \
    --data "$data" \
    --config "$lm_config" \
    --lm_config "$lm_config" \
    --exp "$lm_exp" \
    --num_avg 1 \
    --checkpoint "$exp/models/avg_model.ckpt"
fi
