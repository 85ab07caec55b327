"""Pretrained model hub (wespeaker/cli/hub.py equivalent).

Downloads reference-published checkpoints (torch .pt + config) and converts
them into a local model dir the Speaker API loads. Requires network access;
in air-gapped environments point load_model at a local dir instead.
"""

import os
import sys
import tarfile
import urllib.request

# Published model bundles (mirrors the reference Hub.Assets table).
ASSETS = {
    "english": "wespeaker_en_voxceleb_CAM++.tar.gz",
    "english_lm": "wespeaker_en_voxceleb_CAM++_LM.tar.gz",
    "chinese": "wespeaker_cn_cnceleb_resnet34.tar.gz",
    "chinese_lm": "wespeaker_cn_cnceleb_resnet34_LM.tar.gz",
    "campplus": "campplus_cn_common_200k.tar.gz",
    "eres2net": "eres2net_cn_commom_200k.tar.gz",
    "vblinkp": "wespeaker_en_voxblink2_samresnet34.tar.gz",
    "vblinkf": "wespeaker_en_voxblink2_samresnet34_ft.tar.gz",
}
BASE_URL = ("https://wespeaker-1256283475.cos.ap-shanghai.myqcloud.com"
            "/models/")


def download(url: str, dest: str):
    os.makedirs(dest, exist_ok=True)
    name = url.split("/")[-1]
    target = os.path.join(dest, name)
    if not os.path.exists(target):
        print(f"downloading {url} -> {target}", file=sys.stderr)
        urllib.request.urlretrieve(url, target)
    if name.endswith((".tar.gz", ".tgz")):
        with tarfile.open(target) as tf:
            tf.extractall(dest)
    return dest


class Hub:
    @staticmethod
    def get_model(lang: str) -> str:
        if lang not in ASSETS:
            raise KeyError(f"unknown model '{lang}'; options: "
                           f"{sorted(ASSETS)}")
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "wespeaker_tpu", lang)
        marker = os.path.join(cache, ".complete")
        if not os.path.exists(marker):
            download(BASE_URL + ASSETS[lang], cache)
            open(marker, "w").close()
        return cache
