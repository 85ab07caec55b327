"""Pretrained model hub (wespeaker/cli/hub.py equivalent).

Downloads reference-published checkpoints (torch .pt + config) and converts
them into a local model dir the Speaker API loads. Requires network access;
in air-gapped environments point load_model at a local dir instead.
"""

import os
import sys
import tarfile
import urllib.request

# Published model bundles (the reference Hub.Assets table,
# wespeaker/cli/hub.py:87-95; each unpacks to config.yaml + avg_model.pt).
ASSETS = {
    "chinese": "cnceleb_resnet34.tar.gz",
    "english": "voxceleb_resnet221_LM.tar.gz",
    "campplus": "campplus_cn_common_200k.tar.gz",
    "eres2net": "eres2net_cn_commom_200k.tar.gz",
    "vblinkp": "voxblink2_samresnet34.zip",
    "vblinkf": "voxblink2_samresnet34_ft.zip",
    "w2vbert2_mfa":
        "voxceleb_voxblink2_w2v_bert2_lora_adapterMFA_lm.tar.gz",
}
BASE_URL = ("https://wespeaker-1256283475.cos.ap-shanghai.myqcloud.com"
            "/models/")


def download(url: str, dest: str):
    os.makedirs(dest, exist_ok=True)
    name = url.split("?")[0].split("/")[-1]
    target = os.path.join(dest, name)
    if not os.path.exists(target):
        print(f"downloading {url} -> {target}", file=sys.stderr)
        urllib.request.urlretrieve(url, target)
    if name.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(target) as tf:
            # released tars nest files one directory deep; flatten like the
            # reference (hub.py:55-66) so config.yaml sits in dest
            for info in tf:
                if "/" not in info.name or info.isdir():
                    continue
                base = os.path.basename(info.name)
                src = tf.extractfile(info)
                if src is None:
                    continue
                with open(os.path.join(dest, base), "wb") as out:
                    out.write(src.read())
    elif name.endswith(".zip"):
        import zipfile
        with zipfile.ZipFile(target) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                base = os.path.basename(info.filename)
                with zf.open(info) as src, \
                        open(os.path.join(dest, base), "wb") as out:
                    out.write(src.read())
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
