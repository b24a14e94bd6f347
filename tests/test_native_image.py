"""Native C++ image pipeline vs the PIL reference path (same libjpeg, Pillow-parity
antialiased bilinear resize)."""

import io

import numpy as np
import pytest
from PIL import Image

from fiery_tpu.data.nuscenes_dataset import (IMAGENET_MEAN, IMAGENET_STD,
                                             normalise_image,
                                             resize_and_crop_image)
from fiery_tpu.native import decode_resize_crop_normalize, image_pipe_available

pytestmark = [pytest.mark.fast,
              pytest.mark.skipif(not image_pipe_available(),
                                 reason='native image pipeline not built')]


def _jpeg_bytes(arr, quality=90):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='JPEG', quality=quality)
    return buf.getvalue()


def _pil_path(blob, resize_dims, crop):
    img = Image.open(io.BytesIO(blob))
    img = resize_and_crop_image(img, resize_dims, crop)
    return normalise_image(img)


def test_no_resize_is_exact():
    """With resize == original dims the only transforms are crop + normalise, which
    must match the PIL path bit-exactly (same libjpeg decode)."""
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
    blob = _jpeg_bytes(arr)
    crop = (8, 4, 56, 44)
    ours = decode_resize_crop_normalize([blob], (64, 48), crop,
                                        IMAGENET_MEAN, IMAGENET_STD)
    ref = _pil_path(blob, (64, 48), crop)
    np.testing.assert_allclose(ours[0], ref, atol=1e-6)


def test_downscale_matches_pil_within_one_lsb():
    """The antialiased bilinear downscale must track Pillow within 1 uint8 LSB
    (Pillow uses fixed-point accumulation; we use double)."""
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 255, (120, 160, 3), dtype=np.uint8)
    blob = _jpeg_bytes(arr)
    resize_dims, crop = (48, 36), (2, 4, 46, 32)  # 0.3x like the reference
    ours = decode_resize_crop_normalize([blob], resize_dims, crop,
                                        IMAGENET_MEAN, IMAGENET_STD)
    ref = _pil_path(blob, resize_dims, crop)
    # 1 LSB in normalised units: (1/255) / min(std)
    tol = (1.0 / 255.0) / float(np.min(IMAGENET_STD)) + 1e-6
    assert np.max(np.abs(ours[0] - ref)) <= tol


def test_batch_and_threads():
    rng = np.random.RandomState(2)
    blobs = [_jpeg_bytes(rng.randint(0, 255, (60, 80, 3), dtype=np.uint8))
             for _ in range(7)]
    resize_dims, crop = (40, 30), (0, 6, 40, 30)
    out = decode_resize_crop_normalize(blobs, resize_dims, crop,
                                       IMAGENET_MEAN, IMAGENET_STD,
                                       n_threads=4)
    assert out.shape == (7, 24, 40, 3) and out.dtype == np.float32
    for i, blob in enumerate(blobs):
        ref = _pil_path(blob, resize_dims, crop)
        tol = (1.0 / 255.0) / float(np.min(IMAGENET_STD)) + 1e-6
        assert np.max(np.abs(out[i] - ref)) <= tol


def test_bad_jpeg_raises():
    with pytest.raises(RuntimeError):
        decode_resize_crop_normalize([b'not a jpeg'], (8, 8), (0, 0, 8, 8),
                                     IMAGENET_MEAN, IMAGENET_STD)


def test_fast_scale_decode():
    """DCT-domain scaled decode (DATASET.FAST_DECODE): same output shape,
    bounded pixel error vs the exact full-resolution path, and parity with
    PIL's Image.draft twin at PIL's supported power-of-two ratios."""
    import io
    rng = np.random.RandomState(3)
    # smooth image (natural-image-like): DCT scaling error stays small
    base = rng.randint(0, 255, (15, 20, 3), dtype=np.uint8)
    arr = np.asarray(Image.fromarray(base).resize((320, 240), Image.BILINEAR))
    blob = _jpeg_bytes(arr)
    resize_dims, crop = (96, 72), (0, 8, 96, 72)   # 0.3x -> scale 3/8 legal
    exact = decode_resize_crop_normalize([blob], resize_dims, crop,
                                         IMAGENET_MEAN, IMAGENET_STD)
    fast = decode_resize_crop_normalize([blob], resize_dims, crop,
                                        IMAGENET_MEAN, IMAGENET_STD,
                                        fast_scale=True)
    assert fast.shape == exact.shape
    # error bound: DCT downscale + resize differs from full decode + resize
    # by a few grey levels on smooth content (measured mean 0.42/255 on the
    # synthetic nuScenes trees)
    err = np.abs(fast - exact) * float(np.min(IMAGENET_STD)) * 255.0
    assert err.mean() < 3.0, err.mean()
    assert np.percentile(err, 99) < 16.0

    # PIL draft twin at a power-of-two ratio: identical DCT path
    img = Image.open(io.BytesIO(blob))
    img.draft('RGB', resize_dims)
    ref = img.resize(resize_dims, Image.BILINEAR).crop(crop)
    ref = ((np.asarray(ref, np.float32) / 255.0 - IMAGENET_MEAN)
           / IMAGENET_STD)
    # the native path may pick a finer M/8 ratio than PIL's 1/2^k, so
    # compare loosely (both are the 'fast' family, not bit twins)
    err2 = np.abs(fast[0] - ref) * float(np.min(IMAGENET_STD)) * 255.0
    assert err2.mean() < 3.0, err2.mean()
