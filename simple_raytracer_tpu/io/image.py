"""Image output (PPM/PNG) and skybox loading.

PPM mirrors ``save_ppm`` (src/parser.cpp:4-15): binary P6, RGB.  The
skybox loader reproduces the reference's stb usage (tracer.cpp:42-55):
decode to float RGBA-as-RGB, vertically flipped
(stbi_set_flip_vertically_on_load) so image row 0 is the BOTTOM of the
environment — matching the v = y*0.5+0.5 mapping in render.cl:391.
LDR images are converted like stbi_loadf: (x/255)^2.2 per channel.
"""
from __future__ import annotations

import os

import numpy as np


def save_ppm(path: os.PathLike, image: np.ndarray) -> None:
    """Write an (H, W, 3) u8 RGB image as binary P6."""
    image = np.asarray(image, np.uint8)
    h, w = image.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6 {w} {h} 255\n".encode())
        f.write(image[..., :3].tobytes())


def load_ppm(path: os.PathLike) -> np.ndarray:
    """Read a binary P6 PPM back to (H, W, 3) u8.

    The header is parsed positionally — "P6", width, height, maxval, then
    EXACTLY ONE whitespace byte before the pixel data (the P6 contract).
    Splitting the whole file on whitespace would swallow leading pixel
    bytes that happen to be ASCII whitespace (0x09/0x0A/0x20...)."""
    import re

    with open(path, "rb") as f:
        data = f.read()
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", data)
    if m is None:
        raise ValueError(f"{path}: not a binary P6 PPM")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError(f"{path}: unsupported maxval {maxval}")
    pixels = data[m.end():m.end() + w * h * 3]
    if len(pixels) < w * h * 3:
        raise ValueError(f"{path}: truncated pixel data")
    return np.frombuffer(pixels, np.uint8).reshape(h, w, 3).copy()


def save_png(path: os.PathLike, image: np.ndarray) -> None:
    """Write an (H, W, 3) u8 RGB image as PNG."""
    from PIL import Image

    Image.fromarray(np.asarray(image, np.uint8), "RGB").save(path)


def load_skybox(path: os.PathLike, gamma: float = 2.2) -> np.ndarray:
    """Decode an environment image to (H, W, 3) f32, bottom-up.

    Matches stbi_loadf semantics for LDR sources: linearize with the given
    gamma; the vertical flip matches tracer.cpp:44."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    arr = np.power(arr, np.float32(gamma))
    return arr[::-1].copy()  # flip vertically: row 0 = bottom
