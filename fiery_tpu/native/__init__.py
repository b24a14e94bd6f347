"""Native (C++) host data-plane components, consumed via ctypes.

``image_pipe``: multithreaded JPEG decode -> Pillow-parity antialiased bilinear
resize -> crop -> ImageNet normalisation (image_pipe.cpp). This is the TPU-native
replacement for the reference dataset's per-sample PIL hot loop
(/root/reference/fiery/data.py:126-148) — the host-side bottleneck SURVEY.md
section 7 predicts for real-data training (7 frames x 6 cameras of JPEG decode per
sample).

The shared library is built lazily with g++ on first use and cached next to the
source; everything degrades gracefully to the PIL path when a toolchain or libjpeg
is unavailable (``image_pipe_available()`` -> False).

Thread scaling note: this dev container exposes a single CPU, so the in-batch
thread pool cannot demonstrate speedup here (measured parity with PIL at 1 thread,
decode-bound). On real TPU hosts (100+ cores) the pool parallelises the 6-42
camera decodes of one sample inside each dataloader worker, multiplying the
process-level parallelism of N_WORKERS.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'image_pipe.cpp')
_LIB = os.path.join(_DIR, 'libimage_pipe.so')

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', _SRC, '-o', _LIB + '.tmp',
           '-ljpeg', '-lpthread']
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB + '.tmp', _LIB)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.fp_decode_batch.restype = ctypes.c_int
            lib.fp_decode_batch.argtypes = [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def image_pipe_available():
    """True when the native pipeline compiled/loaded (g++ + libjpeg present)."""
    return _load() is not None and os.environ.get('FIERY_TPU_NO_NATIVE', '') != '1'


def decode_resize_crop_normalize(jpeg_blobs, resize_dims, crop, mean, std,
                                 n_threads=0, fast_scale=False):
    """Batch JPEG -> normalised float32 images, matching the PIL reference path.

    jpeg_blobs: list of ``bytes``; resize_dims: (width, height) like PIL;
    crop: (left, top, right, bottom) like PIL Image.crop; mean/std: (3,) floats.
    Returns (n, crop_h, crop_w, 3) float32. Raises RuntimeError if any image in
    the batch fails to decode.

    fast_scale=True (DATASET.FAST_DECODE) decodes in the DCT domain at the
    smallest M/8 ratio still covering resize_dims before the antialiased
    resize — up to ~4x less IDCT + pixel work for nuScenes' 1600x900 ->
    480x270 shrink. APPROXIMATE relative to the full-resolution reference
    decode (PIL's Image.draft does the same thing); off the parity path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError('native image pipeline unavailable')
    n = len(jpeg_blobs)
    left, top, right, bottom = crop
    crop_w, crop_h = right - left, bottom - top
    out = np.empty((n, crop_h, crop_w, 3), dtype=np.float32)
    blob_ptrs = (ctypes.c_char_p * n)(*jpeg_blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in jpeg_blobs])
    mean_arr = (ctypes.c_float * 3)(*[float(m) for m in np.ravel(mean)])
    std_arr = (ctypes.c_float * 3)(*[float(s) for s in np.ravel(std)])
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)
    failures = lib.fp_decode_batch(
        n, ctypes.cast(blob_ptrs, ctypes.POINTER(ctypes.c_char_p)), lens,
        int(resize_dims[0]), int(resize_dims[1]), int(left), int(top),
        int(crop_w), int(crop_h), mean_arr, std_arr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(n_threads),
        1 if fast_scale else 0)
    if failures:
        raise RuntimeError(f'{failures}/{n} JPEGs failed to decode')
    return out
