"""Native (C++) JPEG pipeline: build, decode correctness, fallback, Dataset wiring."""
import io

import numpy as np
import pytest
from PIL import Image

from imagen_tpu import native


def make_jpeg(w=53, h=37, seed=0, quality=95):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, 'JPEG', quality=quality)
    return buf.getvalue()


needs_native = pytest.mark.skipif(
    not native.available(), reason='native toolchain/libjpeg unavailable')


@needs_native
def test_decode_single():
    out = native.jpeg_decode_resize(make_jpeg(), 16)
    assert out.shape == (16, 16, 3) and out.dtype == np.float32
    assert 0. <= out.min() and out.max() <= 1.


@needs_native
def test_decode_close_to_pil():
    data = make_jpeg(w=64, h=48)
    out = native.jpeg_decode_resize(data, 32)

    pil = Image.open(io.BytesIO(data)).convert('RGB')
    w, h = pil.size
    s = 32 / min(w, h)
    pil = pil.resize((max(32, round(w * s)), max(32, round(h * s))),
                     Image.BILINEAR)
    w, h = pil.size
    left, top = (w - 32) // 2, (h - 32) // 2
    ref = np.asarray(pil.crop((left, top, left + 32, top + 32)),
                     np.float32) / 255
    # filters differ (PIL antialiases when downscaling); same image content
    assert np.abs(ref - out).mean() < 0.1


@needs_native
def test_decode_batch_with_failures():
    good = make_jpeg()
    outs, ok = native.jpeg_decode_resize_batch(
        [good, b'corrupt', good], 16, num_threads=1)
    assert outs.shape == (3, 16, 16, 3)
    assert ok.tolist() == [True, False, True]


@needs_native
def test_decode_hflip():
    data = make_jpeg(w=40, h=40)
    a = native.jpeg_decode_resize(data, 16, hflip=False)
    b = native.jpeg_decode_resize(data, 16, hflip=True)
    np.testing.assert_allclose(a, b[:, ::-1], atol=1e-6)


@needs_native
def test_dataset_uses_native(tmp_path):
    from imagen_tpu.data import Dataset
    Image.fromarray(
        (np.random.rand(40, 40, 3) * 255).astype(np.uint8)
    ).save(tmp_path / 'a.jpg', quality=95)
    ds = Dataset(str(tmp_path), image_size=16, random_flip=False)
    img = ds[0]
    assert img.shape == (16, 16, 3) and img.dtype == np.float32
