"""Video-tensor export (gif / mp4 / npy) — closes the reference's
'converting sampled video tensors to video files is not supported' gap."""
import numpy as np
import pytest

from imagen_tpu.utils.video_io import (
    save_video, save_videos, video_tensor_to_pil_frames)


def _video(f=4, h=8, w=8, c=3, seed=0):
    return np.random.RandomState(seed).rand(f, h, w, c).astype(np.float32)


def test_pil_frames():
    frames = video_tensor_to_pil_frames(_video())
    assert len(frames) == 4
    assert frames[0].size == (8, 8)


def test_save_gif_roundtrip(tmp_path):
    from PIL import Image
    path = save_video(_video(), tmp_path / 'clip.gif', fps=4)
    with Image.open(path) as im:
        assert im.n_frames == 4
        assert im.size == (8, 8)


def test_save_npy_roundtrip(tmp_path):
    vid = _video()
    path = save_video(vid, tmp_path / 'clip.npy')
    np.testing.assert_array_equal(np.load(path), vid)


def test_save_mp4_if_ffmpeg(tmp_path):
    try:
        path = save_video(_video(f=6, h=16, w=16), tmp_path / 'clip.mp4', fps=4)
    except RuntimeError as e:
        pytest.skip(f'no ffmpeg backend: {e}')
    import os
    assert os.path.getsize(path) > 0


def test_save_videos_batch(tmp_path):
    batch = np.stack([_video(seed=i) for i in range(3)])
    paths = save_videos(batch, str(tmp_path / 'v_{}.gif'))
    assert len(paths) == 3


def test_unknown_extension(tmp_path):
    with pytest.raises(ValueError):
        save_video(_video(), tmp_path / 'clip.xyz')
