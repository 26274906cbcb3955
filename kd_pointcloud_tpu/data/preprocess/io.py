"""Raw-format readers for the offline preprocessors.

Rebuild of data_preprocess/IO.py + python_pfm.py: PFM (SceneFlow disparity),
.flo (Middlebury flow), and 16-bit PNG (KITTI disparity/flow) — implemented
with numpy + PIL only (the reference additionally drags in scipy.misc and
pypng).
"""

from __future__ import annotations

import re

import numpy as np


def read_pfm(path: str):
    """Returns (data, scale); rows flipped to top-down like the reference
    (data_preprocess/IO.py:33-66)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip().decode("ascii")
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file")
        dims = f.readline().decode("ascii")
        m = re.match(r"^(\d+)\s(\d+)\s$", dims)
        if not m:
            raise ValueError(f"{path}: malformed PFM header")
        width, height = map(int, m.groups())
        scale = float(f.readline().decode("ascii").rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)), abs(scale)


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0):
    if image.dtype != np.float32:
        raise ValueError("PFM images must be float32")
    color = image.ndim == 3 and image.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode("ascii"))
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode("ascii"))
        np.flipud(image).tofile(f)


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo: 'PIEH' magic, int32 w/h, float32 HxWx2
    (data_preprocess/IO.py:99-114)."""
    with open(path, "rb") as f:
        if f.read(4).decode("utf-8") != "PIEH":
            raise ValueError(f"{path}: missing PIEH header")
        width = int(np.fromfile(f, np.int32, 1)[0])
        height = int(np.fromfile(f, np.int32, 1)[0])
        flow = np.fromfile(f, np.float32, width * height * 2)
    return flow.reshape(height, width, 2)


def write_flo(path: str, flow: np.ndarray):
    with open(path, "wb") as f:
        f.write(b"PIEH")
        np.array([flow.shape[1], flow.shape[0]], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_image(path: str) -> np.ndarray:
    if path.endswith((".pfm", ".PFM")):
        data, _ = read_pfm(path)
        return data[..., :3] if data.ndim == 3 else data
    from PIL import Image

    return np.asarray(Image.open(path))


def read_uint16_png(path: str) -> np.ndarray:
    """16-bit PNG (KITTI encodes disparity ×256 and flow ×64+2^15 in these;
    replaces the reference's pypng reader, data_preprocess/kitti_utils.py:30-38).
    PIL has no 16-bit-RGB mode, so this uses the bundled pure-numpy codec."""
    from .png16 import read_png16

    return read_png16(path).astype(np.uint16)


def read(path: str):
    """Extension-dispatched reader (data_preprocess/IO.py:13-21)."""
    if path.endswith(".flo"):
        return read_flo(path)
    if path.endswith(".pfm"):
        return read_pfm(path)[0]
    if path.endswith((".png", ".jpg", ".ppm", ".pgm")):
        return read_image(path)
    raise ValueError(f"don't know how to read {path}")
