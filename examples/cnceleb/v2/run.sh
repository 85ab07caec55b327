#!/bin/bash
# CNCeleb v2 recipe — the staged-pipeline equivalent of the reference
# examples/cnceleb/v2/run.sh. Expects kaldi-style prep under data/
# (cnceleb_train = CN-Celeb1 dev + CN-Celeb2 with short-utt combination,
# eval wav.scp including the per-genre enroll utterances, enroll.map
# mapping enroll-speaker -> enroll utterances, and the two trial lists
# CNC-Eval-Concat.lst / CNC-Eval-Avg.lst under data/eval/trials).
set -e
. "$(dirname "$0")/../../parse_options.sh" "$@"

stage=${stage:-1}
stop_stage=${stop_stage:-6}
data=${data:-data}
exp=${exp:-exp/resnet34}
config=${config:-conf/resnet.yaml}
lm_config=${lm_config:-conf/resnet_lm.yaml}
trials="CNC-Eval-Concat.lst CNC-Eval-Avg.lst"

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: short-utterance combination + trial formatting ==="
  # reference local/comb_cn1_cn2.sh + combine_utt.sh: group CN-Celeb1-dev +
  # CN-Celeb2 utterances under 5 s into >=5 s concatenations, then write
  # the combined audio next to the originals.
  python -m wespeaker_tpu.bin.prep_data wav2dur \
    --wav_scp $data/cnceleb_train/wav.scp --out $data/cnceleb_train/utt2dur
  python -m wespeaker_tpu.bin.data_dir spk2utt \
    $data/cnceleb_train/utt2spk > $data/cnceleb_train/spk2utt
  python -m wespeaker_tpu.bin.prep_local combine --min-duration 5 \
    $data/cnceleb_train/spk2utt $data/cnceleb_train/utt2dur \
    $data/cnceleb_train/utt2utts $data/cnceleb_train/utt2spk.comb \
    $data/cnceleb_train/utt2dur.comb
  python -m wespeaker_tpu.bin.prep_local combine-audio \
    $data/cnceleb_train/utt2utts $data/raw_audio $data/comb_audio
  # reference local/format_trials_cnceleb.py: raw eval lists -> kaldi trials
  python -m wespeaker_tpu.bin.prep_local cnceleb-trials \
    --cnceleb_root $data/CN-Celeb \
    --dst_trl_path $data/eval/trials/CNC-Eval-Avg.lst
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: data lists (shards for train, raw for eval) ==="
  python -m wespeaker_tpu.bin.prep_data shard \
    --wav_scp $data/cnceleb_train/wav.scp \
    --utt2spk $data/cnceleb_train/utt2spk \
    --shards_dir $data/cnceleb_train/shards \
    --shards_list $data/cnceleb_train/shard.list \
    --num_utts_per_shard 1000 --num_threads 16
  python -m wespeaker_tpu.bin.prep_data raw \
    --wav_scp $data/eval/wav.scp --utt2spk $data/eval/utt2spk \
    --out_list $data/eval/raw.list
  python -m wespeaker_tpu.bin.prep_data aug_store \
    --wav_scp $data/musan/wav.scp --out_prefix $data/musan/store
  python -m wespeaker_tpu.bin.prep_data aug_store \
    --wav_scp $data/rirs/wav.scp --out_prefix $data/rirs/store
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: train (mesh DP over all local chips) ==="
  python -m wespeaker_tpu.bin.train --config $config \
    exp_dir=$exp data_type=shard \
    train_data=$data/cnceleb_train/shard.list \
    utt2spk=$data/cnceleb_train/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: average + extract (train cohort + eval) ==="
  python -m wespeaker_tpu.bin.average_model \
    --src_path $exp/models --dst_model $exp/models/avg_model.ckpt --num 10
  python -m wespeaker_tpu.bin.prep_data raw \
    --wav_scp $data/cnceleb_train/wav.scp \
    --utt2spk $data/cnceleb_train/utt2spk \
    --out_list $data/cnceleb_train/raw.list
  for dset in cnceleb_train eval; do
    python -m wespeaker_tpu.bin.extract --config $exp/config.yaml \
      --checkpoint $exp/models/avg_model.ckpt \
      --data_list $data/$dset/raw.list --out_prefix $exp/embeddings/$dset \
      --batch_size 32
  done
  # multi-utterance enrollment: per-speaker mean over enroll.map
  # (reference local/extract_cnc.sh:55-61 via tools/vector_mean.py)
  python -m wespeaker_tpu.bin.prep_data vector_mean \
    --spk2utt $data/eval/enroll.map \
    --xvector_scp $exp/embeddings/eval.scp \
    --out_prefix $exp/embeddings/enroll_spk
  cat $exp/embeddings/enroll_spk.scp >> $exp/embeddings/eval.scp
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: cosine scoring + EER/minDCF ==="
  mkdir -p $exp/mean && cp $exp/embeddings/cnceleb_train.scp \
    $exp/mean/xvector.scp
  for x in $trials; do
    python -m wespeaker_tpu.bin.score --exp_dir $exp \
      --eval_scp_path $exp/embeddings/eval.scp --cal_mean_dir $exp/mean \
      $data/eval/trials/$x
    python -m wespeaker_tpu.bin.compute_metrics --p_target 0.01 \
      $exp/scores/$x.score
  done
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "=== stage 5: AS-Norm (cohort = cnceleb_train) ==="
  for x in $trials; do
    python -m wespeaker_tpu.bin.score_norm --score_norm_method asnorm \
      --top_n 300 --trial_score_file $exp/scores/$x.score \
      --score_norm_file $exp/scores/$x.asnorm \
      --cohort_emb_scp $exp/embeddings/cnceleb_train.scp \
      --eval_emb_scp $exp/embeddings/eval.scp \
      --mean_vec_path $exp/mean/mean_vec.npy
    python -m wespeaker_tpu.bin.compute_metrics $exp/scores/$x.asnorm
  done
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  echo "=== stage 6: large-margin fine-tune + re-score ==="
  python -m wespeaker_tpu.bin.train --config $lm_config \
    exp_dir=${exp}_lm data_type=shard \
    train_data=$data/cnceleb_train/shard.list \
    utt2spk=$data/cnceleb_train/utt2spk \
    noise_data=$data/musan/store reverb_data=$data/rirs/store \
    checkpoint=$exp/models/avg_model.ckpt
  bash "$0" --stage 3 --stop_stage 5 --exp ${exp}_lm --config $lm_config
fi
