"""VAD segments -> sliding-window subsegments over fbank frames.

Behavioral spec: wespeaker/diar/extract_emb.py:55-84 (1.5s window / 0.75s
period over per-segment fbank, repeat-pad short windows via np.resize) and
the subseg id format `utt-begin_ms-end_ms-beginfr-endfr` consumed by
make_rttm (wespeaker/diar/make_rttm.py:33-45).
"""

from typing import List, Tuple

import numpy as np


def subsegment(fbank: np.ndarray, seg_id: str, window_fs: int = 150,
               period_fs: int = 75, frame_shift: int = 10
               ) -> Tuple[List[str], np.ndarray]:
    """Split one VAD segment's fbank into fixed-length windows.

    Returns (subseg_ids, stacked fbanks of shape (n, window_fs, F)).
    """
    seg_begin, seg_end = seg_id.split("-")[-2:]
    seg_length = (int(seg_end) - int(seg_begin)) // frame_shift
    num_frames, feat_dim = fbank.shape

    subsegs, banks = [], []
    if seg_length <= window_fs:
        subsegs.append(seg_id + f"-{0:08d}-{seg_length:08d}")
        banks.append(np.resize(fbank, (window_fs, feat_dim)))
    else:
        max_subseg_begin = seg_length - window_fs + period_fs
        for subseg_begin in range(0, max_subseg_begin, period_fs):
            subseg_end = min(subseg_begin + window_fs, seg_length)
            subsegs.append(seg_id + f"-{subseg_begin:08d}-{subseg_end:08d}")
            banks.append(np.resize(fbank[subseg_begin:subseg_end],
                                   (window_fs, feat_dim)))
    return subsegs, np.stack(banks)


def segment_id(utt: str, begin_s: float, end_s: float) -> str:
    return f"{utt}-{int(begin_s * 1000):08d}-{int(end_s * 1000):08d}"
