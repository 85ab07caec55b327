"""ctypes bindings to the C++ deployment runtime (runtime/).

Builds lazily with cmake+ninja/make on first use (cached in
runtime/build/). The C++ engine owns wav IO, fbank, chunking and CMN; the
embedding backend is either the built-in mean-mel smoke model or a python
callback bridging to the jitted TPU model (CallbackSpeakerModel).
"""

import ctypes
import os
import subprocess
from typing import Callable, Optional

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNTIME_DIR = os.path.join(REPO_ROOT, "runtime")
BUILD_DIR = os.path.join(RUNTIME_DIR, "build")
LIB_PATH = os.path.join(BUILD_DIR, "libwespeaker_tpu_runtime.so")

_EMBED_CB = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_float),
                             ctypes.c_int, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_float), ctypes.c_void_p)

BINARIES = ("extract_emb_main", "asv_main")


def build_runtime(force: bool = False) -> str:
    built = [LIB_PATH] + [os.path.join(BUILD_DIR, b) for b in BINARIES]
    if all(os.path.exists(p) for p in built) and not force:
        return LIB_PATH
    os.makedirs(BUILD_DIR, exist_ok=True)
    gen = []
    try:
        subprocess.run(["ninja", "--version"], capture_output=True,
                       check=True)
        gen = ["-G", "Ninja"]
    except Exception:
        pass
    subprocess.run(["cmake", *gen, ".."], cwd=BUILD_DIR, check=True,
                   capture_output=True)
    subprocess.run(["cmake", "--build", ".", "-j"], cwd=BUILD_DIR,
                   check=True, capture_output=True)
    return LIB_PATH


def load_library():
    lib = ctypes.CDLL(build_runtime())
    lib.wtpu_fbank_new.restype = ctypes.c_void_p
    lib.wtpu_fbank_new.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_char_p,
                                   ctypes.c_float]
    lib.wtpu_fbank_free.argtypes = [ctypes.c_void_p]
    lib.wtpu_fbank_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.wtpu_fbank_compute.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.wtpu_engine_new_meanmel.restype = ctypes.c_void_p
    lib.wtpu_engine_new_meanmel.argtypes = [ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int]
    lib.wtpu_engine_new_with_callback.restype = ctypes.c_void_p
    lib.wtpu_engine_new_with_callback.argtypes = [
        _EMBED_CB, ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.wtpu_engine_free.argtypes = [ctypes.c_void_p]
    lib.wtpu_engine_extract.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.wtpu_engine_cosine.restype = ctypes.c_float
    lib.wtpu_engine_cosine.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    return lib


class NativeFbank:
    def __init__(self, num_bins=80, sample_rate=16000, frame_length_ms=25,
                 frame_shift_ms=10, window_type="hamming", dither=0.0):
        self.lib = load_library()
        self.num_bins = num_bins
        self.handle = self.lib.wtpu_fbank_new(
            num_bins, sample_rate, frame_length_ms, frame_shift_ms,
            window_type.encode(), dither)

    def __call__(self, wave_int16_range: np.ndarray) -> np.ndarray:
        wave = np.ascontiguousarray(wave_int16_range, np.float32)
        n = self.lib.wtpu_fbank_num_frames(self.handle, len(wave))
        out = np.zeros((n, self.num_bins), np.float32)
        got = self.lib.wtpu_fbank_compute(
            self.handle,
            wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wave),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        assert got == n
        return out

    def __del__(self):
        if getattr(self, "handle", None):
            self.lib.wtpu_fbank_free(self.handle)


class NativeEngine:
    """Speaker engine with either the built-in mean-mel backend or a python
    embedding callback (e.g. the jitted flax model)."""

    def __init__(self, feat_dim=80, sample_rate=16000, chunk_frames=198,
                 embed_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 embed_dim: Optional[int] = None):
        self.lib = load_library()
        if embed_fn is None:
            self.embed_dim = feat_dim
            self._cb = None
            self.handle = self.lib.wtpu_engine_new_meanmel(
                feat_dim, sample_rate, chunk_frames)
        else:
            assert embed_dim is not None
            self.embed_dim = embed_dim

            def _bridge(feats_ptr, num_frames, fd, out_ptr, _user):
                feats = np.ctypeslib.as_array(
                    feats_ptr, shape=(num_frames, fd)).copy()
                emb = np.asarray(embed_fn(feats), np.float32).reshape(-1)
                ctypes.memmove(out_ptr, emb.ctypes.data,
                               emb.nbytes)

            self._cb = _EMBED_CB(_bridge)  # keep alive
            self.handle = self.lib.wtpu_engine_new_with_callback(
                self._cb, None, embed_dim, feat_dim, sample_rate,
                chunk_frames)

    def extract(self, wave_int16_range: np.ndarray) -> np.ndarray:
        wave = np.ascontiguousarray(wave_int16_range, np.float32)
        out = np.zeros(self.embed_dim, np.float32)
        self.lib.wtpu_engine_extract(
            self.handle,
            wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wave),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def cosine(self, a: np.ndarray, b: np.ndarray) -> float:
        a = np.ascontiguousarray(a, np.float32)
        b = np.ascontiguousarray(b, np.float32)
        return float(self.lib.wtpu_engine_cosine(
            self.handle, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a)))

    def __del__(self):
        if getattr(self, "handle", None):
            self.lib.wtpu_engine_free(self.handle)


class NativePipeline:
    """Streaming feature pipeline (AcceptWaveform / Read contract)."""

    def __init__(self, num_bins=80, sample_rate=16000):
        self.lib = load_library()
        self.lib.wtpu_pipeline_new.restype = ctypes.c_void_p
        self.lib.wtpu_pipeline_new.argtypes = [ctypes.c_int, ctypes.c_int]
        self.lib.wtpu_pipeline_free.argtypes = [ctypes.c_void_p]
        self.lib.wtpu_pipeline_accept.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        self.lib.wtpu_pipeline_finish.argtypes = [ctypes.c_void_p]
        self.lib.wtpu_pipeline_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        self.lib.wtpu_pipeline_read.restype = ctypes.c_int
        self.num_bins = num_bins
        self.handle = self.lib.wtpu_pipeline_new(num_bins, sample_rate)

    def accept(self, wav_int16_range: np.ndarray):
        wav = np.ascontiguousarray(wav_int16_range, np.float32)
        self.lib.wtpu_pipeline_accept(
            self.handle,
            wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav))

    def finish(self):
        self.lib.wtpu_pipeline_finish(self.handle)

    def read(self, n: int) -> np.ndarray:
        out = np.zeros((n, self.num_bins), np.float32)
        got = self.lib.wtpu_pipeline_read(
            self.handle, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.num_bins)
        return out[:got]

    def __del__(self):
        if getattr(self, "handle", None):
            self.lib.wtpu_pipeline_free(self.handle)
