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


def _float_to_rgbe(img):
    """(H, W, 3) float -> (H, W, 4) uint8 RGBE (shared-exponent)."""
    img = np.maximum(np.asarray(img, np.float64), 0.0)
    maxc = img.max(axis=-1)
    rgbe = np.zeros(img.shape[:2] + (4,), np.uint8)
    valid = maxc >= 1e-32
    # frexp: maxc = m * 2^e with m in [0.5, 1)
    m, e = np.frexp(np.where(valid, maxc, 1.0))
    scale = m * 256.0 / np.where(valid, maxc, 1.0)
    rgbe[..., :3] = np.where(valid[..., None],
                             np.minimum(img * scale[..., None], 255.0),
                             0.0).astype(np.uint8)
    rgbe[..., 3] = np.where(valid, e + 128, 0).astype(np.uint8)
    return rgbe


def _rgbe_to_float(rgbe):
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)
    return (rgbe[..., :3].astype(np.float64) + 0.5) * scale[..., None]


def save_radiance_hdr(path, img):
    """Radiance .hdr (RGBE, flat scanlines — valid per the spec and
    readable by every .hdr loader; reference analogue: yocto's stb HDR
    writer, SURVEY.md §2.6)."""
    img = np.asarray(img, np.float64)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(_float_to_rgbe(img).tobytes())


def load_radiance_hdr(path):
    """Reads flat and new-style RLE scanlines."""
    with open(path, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError("not a Radiance HDR file")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        dims = f.readline().split()
        h, w = int(dims[1]), int(dims[3])
        data = f.read()
    out = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        # new-style RLE scanline marker: 0x02 0x02 then 16-bit width
        if (w >= 8 and w < 32768 and data[pos] == 2 and data[pos + 1] == 2
                and (data[pos + 2] << 8 | data[pos + 3]) == w):
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    n = data[pos]
                    pos += 1
                    if n > 128:           # run
                        out[y, x:x + n - 128, c] = data[pos]
                        x += n - 128
                        pos += 1
                    else:                 # literal
                        out[y, x:x + n, c] = np.frombuffer(
                            data, np.uint8, n, pos)
                        x += n
                        pos += n
        else:                             # flat scanline
            out[y] = np.frombuffer(data, np.uint8, w * 4,
                                   pos).reshape(w, 4)
            pos += w * 4
    return _rgbe_to_float(out)


def save_hdr(path, img):
    """Dispatch on extension: .pfm, .exr, .hdr (Radiance RGBE), .npy."""
    p = str(path)
    if p.endswith(".pfm"):
        save_pfm(path, img)
    elif p.endswith(".exr"):
        from .exr import save_exr
        save_exr(path, img)
    elif p.endswith(".hdr"):
        save_radiance_hdr(path, img)
    else:
        np.save(path, np.asarray(img, np.float32))


def load_hdr(path):
    p = str(path)
    if p.endswith(".pfm"):
        return load_pfm(path)
    if p.endswith(".exr"):
        from .exr import load_exr
        return load_exr(path)
    if p.endswith(".hdr"):
        return load_radiance_hdr(path)
    return np.load(path).astype(np.float64)


def save_jpg(path, img, exposure=0.0, filmic=False, quality=92):
    """Tonemapped JPEG (reference's LDR formats, SURVEY.md §2.6)."""
    from PIL import Image
    ldr = (tonemap(img, exposure, filmic) * 255 + 0.5).astype(np.uint8)
    Image.fromarray(ldr).save(path, quality=quality)


def load_jpg(path, to_linear=True):
    return load_png(path, to_linear=to_linear)


def resize(img, height, width):
    """Bilinear resize of an HDR (H, W, C) / (H, W) image (the
    reference's resize_image [U:yocto_image])."""
    img = np.asarray(img, np.float64)
    h, w = img.shape[:2]
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    if img.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy
