#!/bin/bash
# NIST SRE recipe with embedding-processing chains
# (reference examples/sre/v3 equivalent): CTS-superset training, then a
# composable `mean-subtract | length-norm | lda | length-norm` chain
# estimated on in-domain data and applied to all embeddings before
# cosine / PLDA / adapted-PLDA scoring.
set -e
. "$(dirname "$0")/../../parse_options.sh" "$@"
stage=${stage:-3}
stop_stage=${stop_stage:-9}
data=${data:-data}
exp=${exp:-exp/sre_v3_resnet34}
config=${config:-conf/resnet34_sre.yaml}
trials="$data/sre16/trials"
lda_dim=${lda_dim:-100}
# set to the unlabeled in-domain set used for mean subtraction / adaptation
adapt_set=${adapt_set:-sre16_major}

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  python -m wespeaker_tpu.bin.train --config $config exp_dir=$exp \
    data_type=shard train_data=$data/cts/shard.list \
    utt2spk=$data/cts/utt2spk
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  python -m wespeaker_tpu.bin.average_model --src_path $exp/models \
    --dst_model $exp/models/avg_model.ckpt --num 10
  for dset in cts $adapt_set enroll test; do
    python -m wespeaker_tpu.bin.extract --config $exp/config.yaml \
      --checkpoint $exp/models/avg_model.ckpt \
      --data_list $data/$dset/raw.list --out_prefix $exp/embeddings/$dset
  done
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "=== estimate embedding-processing chain ==="
  # mean from the in-domain set; LDA on the (labeled) training set
  python -m wespeaker_tpu.bin.embd_proc prep \
    --chain "mean-subtract --scp $exp/embeddings/$adapt_set.scp | length-norm | lda --scp $exp/embeddings/cts.scp --utt2spk $data/cts/utt2spk --dim $lda_dim | length-norm" \
    --out $exp/embd_proc.pkl
  for dset in cts $adapt_set enroll test; do
    python -m wespeaker_tpu.bin.embd_proc apply --proc $exp/embd_proc.pkl \
      --in_scp $exp/embeddings/$dset.scp \
      --out_prefix $exp/embeddings/${dset}_proc
  done
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  echo "=== cosine scoring on processed embeddings ==="
  cat $exp/embeddings/enroll_proc.scp $exp/embeddings/test_proc.scp \
    > $exp/embeddings/eval_proc.scp
  python -m wespeaker_tpu.bin.score --exp_dir $exp \
    --eval_scp_path $exp/embeddings/eval_proc.scp $trials
  python -m wespeaker_tpu.bin.compute_metrics \
    $exp/scores/$(basename $trials).score
fi

if [ $stage -le 7 ] && [ $stop_stage -ge 7 ]; then
  echo "=== PLDA on processed embeddings ==="
  python -m wespeaker_tpu.bin.plda_tools train \
    --scp_path $exp/embeddings/cts_proc.scp \
    --utt2spk $data/cts/utt2spk \
    --model_path $exp/plda.h5 --embed_dim $lda_dim
  python -m wespeaker_tpu.bin.plda_tools eval \
    --enroll_scp_path $exp/embeddings/enroll_proc.scp \
    --enroll_utt2spk $data/enroll/utt2spk \
    --test_scp_path $exp/embeddings/test_proc.scp \
    --trials $trials --score_path $exp/scores/plda.score \
    --model_path $exp/plda.h5
  python -m wespeaker_tpu.bin.compute_metrics $exp/scores/plda.score
fi

if [ $stage -le 8 ] && [ $stop_stage -ge 8 ]; then
  echo "=== adapted PLDA ==="
  python -m wespeaker_tpu.bin.plda_tools adapt \
    --model_path $exp/plda.h5 \
    --adapt_scp_path $exp/embeddings/${adapt_set}_proc.scp \
    --out_model $exp/plda_adapt.h5
  python -m wespeaker_tpu.bin.plda_tools eval \
    --enroll_scp_path $exp/embeddings/enroll_proc.scp \
    --enroll_utt2spk $data/enroll/utt2spk \
    --test_scp_path $exp/embeddings/test_proc.scp \
    --trials $trials --score_path $exp/scores/plda_adapt.score \
    --model_path $exp/plda_adapt.h5
  python -m wespeaker_tpu.bin.compute_metrics $exp/scores/plda_adapt.score
fi
