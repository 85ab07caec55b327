#!/bin/bash
# NIST SRE16 recipe (reference examples/sre/v2 equivalent): fbank40 softmax
# training + PLDA backend with unsupervised domain adaptation.
set -e
. "$(dirname "$0")/../../parse_options.sh" "$@"
stage=${stage:-3}
data=${data:-data}
exp=${exp:-exp/sre_resnet34}
config=${config:-conf/resnet34_sre.yaml}
trials="$data/sre16/trials"

if [ $stage -le 3 ]; then
  python -m wespeaker_tpu.bin.train --config $config exp_dir=$exp \
    data_type=shard train_data=$data/swbd_sre/shard.list \
    utt2spk=$data/swbd_sre/utt2spk
fi
if [ $stage -le 4 ]; then
  python -m wespeaker_tpu.bin.average_model --src_path $exp/models \
    --dst_model $exp/models/avg_model.ckpt --num 10
  for dset in swbd_sre sre16_major enroll test; do
    python -m wespeaker_tpu.bin.extract --config $exp/config.yaml \
      --checkpoint $exp/models/avg_model.ckpt \
      --data_list $data/$dset/raw.list --out_prefix $exp/embeddings/$dset
  done
fi
if [ $stage -le 5 ]; then
  echo "=== PLDA train / adapt / eval ==="
  python -m wespeaker_tpu.bin.plda_tools train \
    --scp_path $exp/embeddings/swbd_sre.scp \
    --utt2spk $data/swbd_sre/utt2spk \
    --model_path $exp/plda.h5 --embed_dim 256
  python -m wespeaker_tpu.bin.plda_tools adapt \
    --model_path $exp/plda.h5 \
    --adapt_scp_path $exp/embeddings/sre16_major.scp \
    --out_model $exp/plda_adapt.h5
  python -m wespeaker_tpu.bin.plda_tools eval \
    --enroll_scp_path $exp/embeddings/enroll.scp \
    --enroll_utt2spk $data/enroll/utt2spk \
    --test_scp_path $exp/embeddings/test.scp \
    --trials $trials --score_path $exp/scores/plda_adapt.score \
    --model_path $exp/plda_adapt.h5 \
    --indomain_scp $exp/embeddings/sre16_major.scp
fi
