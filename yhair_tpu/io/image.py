"""Image IO + tonemapping.

Reference analogue: yocto_image [U:libs/yocto/yocto_image.{h,cpp}],
SURVEY.md §2.6 — HDR buffers, sRGB / filmic tonemap with exposure, PNG and
HDR save/load. HDR storage uses PFM (portable float map, readable
everywhere) and .npy; LDR uses PNG via PIL.
"""

from __future__ import annotations

import numpy as np


def srgb_encode(x):
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * x ** (1.0 / 2.4) - 0.055)


def srgb_decode(x):
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def tonemap(hdr, exposure=0.0, filmic=False, srgb=True):
    """yocto-style tonemap: exposure scale, optional filmic curve, sRGB."""
    x = np.asarray(hdr, np.float64) * (2.0 ** exposure)
    if filmic:
        # ACES filmic fit (Narkowicz) — the curve yocto's filmic uses
        x *= 0.6
        x = (x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14)
    x = np.clip(x, 0.0, 1.0)
    return srgb_encode(x) if srgb else x


def save_png(path, img, exposure=0.0, filmic=False):
    from PIL import Image
    ldr = (tonemap(img, exposure, filmic) * 255 + 0.5).astype(np.uint8)
    Image.fromarray(ldr).save(path)


def load_png(path, to_linear=True):
    from PIL import Image
    arr = np.asarray(Image.open(path), np.float64) / 255.0
    return srgb_decode(arr) if to_linear else arr


def save_pfm(path, img):
    """PFM: 'PF' header, W H, negative scale = little endian."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n" if img.ndim == 3 else b"Pf\n")
        f.write(f"{w} {h}\n-1.0\n".encode())
        f.write(np.flipud(img).astype("<f4").tobytes())


def load_pfm(path):
    with open(path, "rb") as f:
        magic = f.readline().strip()
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    c = 3 if magic == b"PF" else 1
    img = data.reshape(h, w, c) if c == 3 else data.reshape(h, w)
    return np.flipud(img).astype(np.float64)


def save_hdr(path, img):
    """Dispatch on extension: .pfm or .npy."""
    if str(path).endswith(".pfm"):
        save_pfm(path, img)
    else:
        np.save(path, np.asarray(img, np.float32))


def load_hdr(path):
    if str(path).endswith(".pfm"):
        return load_pfm(path)
    return np.load(path).astype(np.float64)
