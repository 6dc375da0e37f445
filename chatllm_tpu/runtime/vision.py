"""Image preprocessing for vision models.

Port of the reference's vision_process semantics
(/root/reference/src/vision_process.h:17-160) with PIL instead of the
ImageMagick shell-out: load/resize/normalize, and the InternVL dynamic
tiling (closest-aspect-ratio grid split + optional thumbnail).
"""
from __future__ import annotations

import math
from typing import Iterable

import numpy as np


def load_image(path_or_obj):
    from PIL import Image

    img = Image.open(path_or_obj) if not hasattr(path_or_obj, "convert") else path_or_obj
    return img.convert("RGB")


def to_array(img, size: int | tuple[int, int], mean, std) -> np.ndarray:
    """Resize to `size` and normalize → [H, W, 3] f32."""
    from PIL import Image

    if isinstance(size, int):
        size = (size, size)
    img = img.resize(size, Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return (arr - mean) / std


def find_closest_aspect_ratio(aspect: float, ratios: Iterable[tuple[int, int]],
                              width: int, height: int, image_size: int):
    """InternVL dynamic_preprocess ratio selection."""
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for r in ratios:
        target = r[0] / r[1]
        diff = abs(aspect - target)
        if diff < best_diff:
            best_diff = diff
            best = r
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * r[0] * r[1]:
                best = r
    return best


def internvl_tiles(img, *, image_size: int = 448, min_num: int = 1,
                   max_num: int = 12, use_thumbnail: bool = True,
                   mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """InternVL dynamic preprocessing: split into up to max_num image_size²
    tiles matching the closest grid aspect ratio, plus an optional thumbnail.
    Returns (tiles [N, S, S, 3] f32, grid (gw, gh))."""
    from PIL import Image

    w, h = img.size
    aspect = w / h
    ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda r: r[0] * r[1])
    gw, gh = find_closest_aspect_ratio(aspect, ratios, w, h, image_size)
    tw, th = image_size * gw, image_size * gh
    resized = img.resize((tw, th), Image.BICUBIC)
    tiles = []
    for idx in range(gw * gh):
        x = (idx % gw) * image_size
        y = (idx // gw) * image_size
        tile = resized.crop((x, y, x + image_size, y + image_size))
        tiles.append(np.asarray(tile, np.float32) / 255.0)
    if use_thumbnail and len(tiles) != 1:
        thumb = img.resize((image_size, image_size), Image.BICUBIC)
        tiles.append(np.asarray(thumb, np.float32) / 255.0)
    arr = np.stack(tiles)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return (arr - mean) / std, (gw, gh)


def qwen_smart_resize(height: int, width: int, factor: int = 28,
                      min_pixels: int = 56 * 56,
                      max_pixels: int = 14 * 14 * 4 * 1280) -> tuple[int, int]:
    """Qwen2-VL smart_resize: round each side to a multiple of
    `factor` (= patch*merge) keeping total pixels within [min, max]
    (reference vision preprocessing for qwen, src/vision_process.cpp)."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio too extreme")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def qwen_image_frames(img, *, patch_size: int = 14, merge_size: int = 2,
                      min_pixels: int = 56 * 56,
                      max_pixels: int = 14 * 14 * 4 * 1280,
                      mean=(0.48145466, 0.4578275, 0.40821073),
                      std=(0.26862954, 0.26130258, 0.27577711)):
    """Qwen-VL still image → ([2, H, W, 3] f32 normalized temporal frame pair
    (duplicated for stills), grid_h, grid_w)."""
    w, h = img.size
    h_bar, w_bar = qwen_smart_resize(h, w, patch_size * merge_size,
                                     min_pixels, max_pixels)
    arr = to_array(img, (w_bar, h_bar), mean, std)
    frames = np.stack([arr, arr])
    return frames, h_bar // patch_size, w_bar // patch_size


def extract_video_frames(path: str, max_frames: int = 8, fps: float = 1.0):
    """Extract frames from a video via ffmpeg (reference video handling,
    src/vision_process.h:17-160 uses the same shell-out).  Returns a list of
    PIL images."""
    import io
    import shutil
    import subprocess

    from PIL import Image

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("need ffmpeg for video input")
    out = subprocess.run(
        [ffmpeg, "-nostdin", "-i", path, "-vf", f"fps={fps}",
         "-frames:v", str(max_frames), "-f", "image2pipe",
         "-vcodec", "png", "pipe:1"],
        check=True, capture_output=True)
    frames = []
    data = out.stdout
    sig = b"\x89PNG\r\n\x1a\n"
    starts = []
    i = data.find(sig)
    while i >= 0:
        starts.append(i)
        i = data.find(sig, i + 8)
    for j, s in enumerate(starts):
        e = starts[j + 1] if j + 1 < len(starts) else len(data)
        frames.append(Image.open(io.BytesIO(data[s:e])).convert("RGB"))
    return frames


def step_pan_and_scan(img, *, image_size: int, crop_size: int = 504,
                      max_image_size: int = 3024):
    """Step-VL pan-and-scan (reference src/vision_process.cpp:451-620,
    image_load_pan_and_scan(fn, crops, image_size, crop_size, crops_per_row)).

    Returns (crops, crops_per_row) where crops[0] is the whole view resized
    to image_size², followed by raster-order crop_size² sliding windows
    (empty beyond [0] when no window size activates).  All crops are PIL
    images.
    """
    from PIL import Image

    w, h = img.size

    # extreme thin strips get black-padded square (get_image_size_for_padding)
    ratio = w / h
    if min(w, h) < 32 and (ratio > 4.0 or ratio < 0.25):
        side = max(w, h)
        canvas = Image.new("RGB", (side, side))
        canvas.paste(img.convert("RGB"), (0, 0))
        img = canvas
        w = h = side

    # clamp the long side (get_image_size_for_preprocess)
    if max(w, h) > max_image_size:
        s = max_image_size / max(w, h)
        w, h = int(w * s), int(h * s)
        img = img.resize((w, h))

    long_side, short_side = max(w, h), min(w, h)
    if long_side <= 728:
        window = short_side if long_side / short_side > 1.5 else 0
    else:
        window = min(short_side, 504) if long_side / short_side > 4 else 504

    whole = img.resize((image_size, image_size))
    crops = [whole]
    crops_per_row = 0
    if window <= 1:
        return crops, crops_per_row

    # snap dims to window multiples (get_image_size_for_crop: round up when
    # the fractional overhang exceeds 0.2 windows)
    def snap(n):
        r = n / window
        if r >= 1:
            frac = r - n // window
            r = int(r) + 1 if frac > 0.2 else int(r)
            return window * r
        return n

    nw, nh = snap(w), snap(h)
    if (nw, nh) != (w, h):
        img = img.resize((nw, nh))
        w, h = nw, nh

    # non-overlapping crop_size sliding windows (slide_window, step==size)
    crops_per_row = 1 if w <= crop_size else -(-(w - crop_size) // crop_size) + 1
    n_rows = 1 if h <= crop_size else -(-(h - crop_size) // crop_size) + 1
    for j in range(n_rows):
        y0 = min(crop_size * j, h - crop_size) if h > crop_size else 0
        for i in range(crops_per_row):
            x0 = min(crop_size * i, w - crop_size) if w > crop_size else 0
            box = (x0, y0, min(x0 + crop_size, w), min(y0 + crop_size, h))
            crops.append(img.crop(box).resize((crop_size, crop_size)))
    return crops, crops_per_row
