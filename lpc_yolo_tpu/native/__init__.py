"""ctypes binding to the native C++ pre/post pipeline (native/pre_post.cc).

The shared library is built on demand with g++ (no pybind11 in this
environment); the binding mirrors the reference's native deployment examples
(SURVEY.md §2.2) as an in-process fast path for letterbox/decode/NMS.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libpre_post.so"
_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> Path:
    """Compile native/pre_post.cc -> libpre_post.so (g++ -O3, on demand)."""
    src = _NATIVE_DIR / "pre_post.cc"
    if _LIB_PATH.exists() and not force and _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
        return _LIB_PATH
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
         str(src), "-o", str(_LIB_PATH)],
        check=True,
        capture_output=True,
    )
    return _LIB_PATH


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(build_native()))
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        fp = ctypes.POINTER(ctypes.c_float)
        lib.letterbox_u8.restype = ctypes.c_float
        lib.letterbox_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
                                     ctypes.c_ubyte, ctypes.c_int, fp, fp]
        lib.normalize_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int]
        lib.nms_xyxy.restype = ctypes.c_int
        lib.nms_xyxy.argtypes = [f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int, i32p]
        lib.decode_head.restype = ctypes.c_int
        lib.decode_head.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_float, f32p, ctypes.c_int]
        lib.scale_boxes_inplace.argtypes = [f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
                                            ctypes.c_float, ctypes.c_int, ctypes.c_int]
        _lib = lib
    return _lib


def letterbox(img: np.ndarray, size: int = 640, pad_value: int = 114, scaleup: bool = True) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Native letterbox: HWC uint8 -> (size, size, 3) uint8, gain, (dw, dh)."""
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h0, w0 = img.shape[:2]
    out = np.empty((size, size, 3), np.uint8)
    dw, dh = ctypes.c_float(), ctypes.c_float()
    gain = lib.letterbox_u8(img, h0, w0, out, size, pad_value, int(scaleup),
                            ctypes.byref(dw), ctypes.byref(dh))
    return out, float(gain), (dw.value, dh.value)


def normalize(img_u8: np.ndarray, chw: bool = True, bgr2rgb: bool = True) -> np.ndarray:
    lib = load()
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    h, w = img_u8.shape[:2]
    out = np.empty((3, h, w) if chw else (h, w, 3), np.float32)
    lib.normalize_u8(img_u8, h, w, out.reshape(-1), int(chw), int(bgr2rgb))
    return out


def nms(cand: np.ndarray, iou_thres: float = 0.45, max_det: int = 300, agnostic: bool = False) -> np.ndarray:
    """Greedy NMS over rows [x1,y1,x2,y2,score,cls]; returns kept rows."""
    lib = load()
    cand = np.ascontiguousarray(cand, dtype=np.float32)
    keep = np.empty(max_det, np.int32)
    k = lib.nms_xyxy(cand.reshape(-1), len(cand), iou_thres, max_det, int(agnostic), keep)
    return cand[keep[:k]]


def decode_v8_head(out: np.ndarray, nc: int, conf: float = 0.25, v5_layout: bool = False) -> np.ndarray:
    """Decode fp32 [(4+nc), A] (or v5 [A, 5+nc]) to candidate rows."""
    lib = load()
    out = np.ascontiguousarray(out, dtype=np.float32)
    A = out.shape[1] if not v5_layout else out.shape[0]
    cand = np.empty((A, 6), np.float32)
    n = lib.decode_head(out.reshape(-1), A, nc, int(v5_layout), conf, cand.reshape(-1), A)
    return cand[:n]


def build_tf_client(force: bool = False) -> Path:
    """Compile native/tf_client.cc -> tf_client executable (TF C API link).

    The native analog of the reference's model-executing clients
    (examples/YOLOv8-CPP-Inference, -ONNXRuntime-CPP): runs the Exporter's
    SavedModel natively with no Python in the loop.
    """
    import tensorflow as tf

    tf_root = Path(tf.__file__).parent
    src = _NATIVE_DIR / "tf_client.cc"
    out = _NATIVE_DIR / "tf_client"
    if out.exists() and not force and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    subprocess.run(
        [
            "g++", "-O2", "-std=c++17", f"-I{tf_root}/include",
            str(src), str(_NATIVE_DIR / "pre_post.cc"), "-o", str(out),
            f"-L{tf_root}", "-l:libtensorflow_cc.so.2", "-l:libtensorflow_framework.so.2",
            f"-Wl,-rpath,{tf_root}",
        ],
        check=True,
        capture_output=True,
    )
    return out
