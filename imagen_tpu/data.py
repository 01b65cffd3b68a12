"""Data pipeline: folder image dataset, HF-dataset collator, numpy DataLoader.

Capability parity with the reference data.py (/root/reference/imagen_pytorch/data.py:1-136)
without torch: batches are numpy arrays in NHWC ready for `jnp.asarray` + device_put.
The host-side loader overlaps with device compute naturally (dispatch is async in JAX).
"""
from __future__ import annotations

import random
from pathlib import Path

import numpy as np

from imagen_tpu.utils.helpers import exists


def cycle(dl):
    """Infinite iterator; reference data.py:24-27.

    Guards against an empty dataloader (mirrors trainer.cycle,
    trainer.py:100-109) — a bare `while True: for ...` would spin forever
    yielding nothing.
    """
    while True:
        yielded = False
        for data in dl:
            yielded = True
            yield data
        if not yielded:
            raise ValueError(
                'dataloader yielded no batches - is the dataset empty?')


def convert_image_to(img_type, image):
    if image.mode != img_type:
        return image.convert(img_type)
    return image


class Dataset:
    """Folder-glob image dataset with resize / random-flip / center-crop.

    Reference data.py:91-120 (torchvision transforms -> PIL + numpy here).
    Yields NHWC float32 images in [0, 1].
    """

    def __init__(self, folder, image_size, exts=('jpg', 'jpeg', 'png', 'tiff'),
                 convert_image_to_type=None, random_flip=True, seed=None,
                 use_native=True):
        super().__init__()
        self.folder = folder
        self.image_size = image_size
        self.paths = sorted(
            p for ext in exts for p in Path(folder).glob(f'**/*.{ext}'))
        self.convert_image_to_type = convert_image_to_type
        self.random_flip = random_flip
        self._rng = random.Random(seed)
        self.use_native = use_native

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        from PIL import Image
        path = self.paths[index]

        # native fast path: one-pass JPEG decode+resize+crop+flip in C++
        if (self.use_native and path.suffix.lower() in ('.jpg', '.jpeg')
                and self.convert_image_to_type in (None, 'RGB')):
            from imagen_tpu import native
            if native.available():
                hflip = self.random_flip and self._rng.random() < 0.5
                arr = native.jpeg_decode_resize(
                    path.read_bytes(), self.image_size, hflip=hflip)
                if arr is not None:
                    return arr

        img = Image.open(path)

        if exists(self.convert_image_to_type):
            img = convert_image_to(self.convert_image_to_type, img)
        elif img.mode != 'RGB':
            img = img.convert('RGB')

        # resize shortest side then center crop (torchvision Resize+CenterCrop semantics)
        w, h = img.size
        scale = self.image_size / min(w, h)
        img = img.resize((max(self.image_size, round(w * scale)),
                          max(self.image_size, round(h * scale))),
                         Image.BILINEAR)
        w, h = img.size
        left = (w - self.image_size) // 2
        top = (h - self.image_size) // 2
        img = img.crop((left, top, left + self.image_size, top + self.image_size))

        if self.random_flip and self._rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)

        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        return arr


class Collator:
    """Collates HF-dataset rows: fetches image (optionally by URL), encodes captions
    with T5 on the fly, pads embeddings, drops failed rows.

    Reference data.py:36-89. Produces dict batches (images, text_embeds, text_masks).
    """

    def __init__(self, image_size, url_label=None, text_label=None, image_label=None,
                 name=None, channels='RGB'):
        self.url_label = url_label
        self.text_label = text_label
        self.image_label = image_label
        self.download = url_label is not None
        self.name = name
        self.image_size = image_size
        self.channels = channels

    def __call__(self, batch):
        from imagen_tpu.models.t5 import t5_encode_text

        texts = []
        images = []
        for item in batch:
            try:
                if self.download:
                    image = self.fetch_single_image(item[self.url_label])
                else:
                    image = item[self.image_label]
                image = self.transform_image(image)
                if image is None:
                    continue
            except Exception:
                continue
            images.append(image)
            texts.append(item[self.text_label])

        if len(images) == 0:
            return None

        encoded = t5_encode_text(texts, name=self.name)
        encoded = np.asarray(encoded)
        masks = np.any(encoded != 0., axis=-1)

        return dict(
            images=np.stack(images),
            text_embeds=encoded,
            text_masks=masks,
        )

    def transform_image(self, image):
        """Resize shortest side to image_size then center-crop (the reference's
        Resize+CenterCrop Collator transform, data.py:44-48) — aspect ratio is
        preserved, not squashed."""
        from PIL import Image
        try:
            if isinstance(image, (bytes, bytearray)):
                import io
                image = Image.open(io.BytesIO(image))
            image = image.convert(self.channels)

            w, h = image.size
            scale = self.image_size / min(w, h)
            nw, nh = max(self.image_size, round(w * scale)), \
                max(self.image_size, round(h * scale))
            image = image.resize((nw, nh), Image.BILINEAR)
            left = (nw - self.image_size) // 2
            top = (nh - self.image_size) // 2
            image = image.crop(
                (left, top, left + self.image_size, top + self.image_size))

            arr = np.asarray(image, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            return arr
        except Exception:
            return None

    def fetch_single_image(self, image_url, timeout=1):
        import io
        import urllib.request
        from PIL import Image
        try:
            request = urllib.request.Request(
                image_url, data=None,
                headers={'user-agent': 'imagen-tpu/0 (fetching images for training)'})
            with urllib.request.urlopen(request, timeout=timeout) as req:
                return Image.open(io.BytesIO(req.read()))
        except Exception:
            return None


class Subset:
    def __init__(self, ds, indices):
        self.ds = ds
        self.indices = indices

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.ds[self.indices[i]]


def split_dataset(ds, train_fraction, seed=42):
    """Random train/valid split; replaces torch random_split (trainer.py:564-577)."""
    n = len(ds)
    train_size = int(train_fraction * n)
    rng = random.Random(seed)
    indices = list(range(n))
    rng.shuffle(indices)
    return Subset(ds, indices[:train_size]), Subset(ds, indices[train_size:])


def _default_collate(items):
    first_item = items[0]
    if isinstance(first_item, dict):
        return {k: _default_collate([it[k] for it in items]) for k in first_item}
    if isinstance(first_item, (tuple, list)):
        return tuple(_default_collate(list(col)) for col in zip(*items))
    return np.stack([np.asarray(it) for it in items])


class DataLoader:
    """Minimal host-side batching loader over an indexable dataset."""

    def __init__(self, dataset, *, batch_size, shuffle=True, drop_last=True,
                 collate_fn=None, seed=None, **_ignored):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # NB: not helpers.default() — it would *call* the collate fn
        self.collate_fn = collate_fn if collate_fn is not None else _default_collate
        self._rng = random.Random(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            # never report zero batches for a non-empty dataset (see __iter__)
            return max(n // self.batch_size, 1 if n else 0)
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        indices = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(indices)
        for start in range(0, len(indices), self.batch_size):
            chunk = indices[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size and start > 0:
                # drop a trailing partial batch — but if the WHOLE dataset is
                # smaller than batch_size (start == 0), yield it anyway: a loader
                # that never yields livelocks `cycle()` (e.g. a tiny auto-split
                # validation set with a large batch_size)
                break
            batch = self.collate_fn([self.dataset[i] for i in chunk])
            if batch is None:
                continue
            yield batch


class PrefetchLoader:
    """Wrap a dataloader with a background-thread prefetch queue so host-side decode
    overlaps device compute (the JAX dispatch is already async on the device side)."""

    def __init__(self, dl, prefetch: int = 2):
        self.dl = dl
        self.prefetch = prefetch

    def __len__(self):
        return len(self.dl)

    def __iter__(self):
        import queue
        import threading

        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for item in self.dl:
                    q.put(item)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def get_images_dataloader(folder, *, batch_size, image_size, shuffle=True,
                          cycle_dl=False, pin_memory=True, prefetch=2, **kwargs):
    """reference data.py:122-136 (`pin_memory` accepted for parity; no-op here)."""
    ds = Dataset(folder, image_size, **kwargs)
    dl = DataLoader(ds, batch_size=batch_size, shuffle=shuffle)
    if prefetch:
        dl = PrefetchLoader(dl, prefetch=prefetch)
    if cycle_dl:
        dl = cycle(dl)
    return dl
