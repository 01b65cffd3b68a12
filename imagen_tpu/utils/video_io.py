"""Video-tensor export: sampled (f, h, w, c) tensors -> gif / mp4 / npy files.

Beyond-reference capability (the reference asserts video-to-file conversion
unsupported, imagen_pytorch.py:2492 analog): closes the last `assert ...
not supported` in the public sample path (PARITY.md gap list).

Format is chosen by file extension:
- .gif          PIL (always available)
- .mp4 / .webm  imageio + ffmpeg when present, else raises with guidance
- .npy          raw numpy dump (lossless, always available)
"""
from __future__ import annotations

import numpy as np


def _to_uint8_frames(video):
    """(f, h, w, c) float [0,1] or uint8 -> uint8 numpy frames."""
    video = np.asarray(video)
    assert video.ndim == 4, f'expected (frames, h, w, c), got {video.shape}'
    if video.dtype != np.uint8:
        video = (np.clip(video, 0., 1.) * 255).round().astype(np.uint8)
    return video


def video_tensor_to_pil_frames(video):
    """Per-frame PIL images from one (f, h, w, c) video tensor."""
    from PIL import Image
    frames = _to_uint8_frames(video)
    if frames.shape[-1] == 1:
        frames = frames[..., 0]
    return [Image.fromarray(f) for f in frames]


def save_video(video, path, fps: int = 8):
    """Write one sampled video tensor (f, h, w, c) to `path`; returns the path."""
    path = str(path)
    ext = path.rsplit('.', 1)[-1].lower() if '.' in path else ''

    if ext == 'npy':
        np.save(path, np.asarray(video))
        return path

    if ext == 'gif':
        frames = video_tensor_to_pil_frames(video)
        frames[0].save(path, save_all=True, append_images=frames[1:],
                       duration=max(1, round(1000 / fps)), loop=0)
        return path

    if ext in ('mp4', 'webm', 'mkv', 'avi'):
        try:
            import imageio
            writer = imageio.get_writer(path, fps=fps)
        except Exception as e:  # imageio or its ffmpeg backend missing
            raise RuntimeError(
                f'cannot write .{ext} (imageio/ffmpeg unavailable: {e}); '
                f'use .gif or .npy instead') from e
        with writer:
            for frame in _to_uint8_frames(video):
                writer.append_data(frame)
        return path

    raise ValueError(f'unknown video extension {ext!r} for {path}; '
                     f'use .gif, .mp4, or .npy')


def save_videos(videos, path_template, fps: int = 8):
    """Write a batch (b, f, h, w, c): path_template is formatted with the index
    (e.g. 'out_{}.gif'). Returns the list of written paths."""
    return [save_video(v, path_template.format(i), fps=fps)
            for i, v in enumerate(np.asarray(videos))]
