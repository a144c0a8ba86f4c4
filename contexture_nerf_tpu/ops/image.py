"""Image-space utilities (reference: src/utils.py).

All hot-path variants are shape-static jnp (jit-safe); bbox computation is
host-side because the reference computes crops once per experiment from fixed
masks (trainer.py:570-599) — the resulting bounds are Python ints baked into
the jitted step as static slices.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_view_direction(thetas, phis, overhead, front):
    """Bin (theta, phi) into {front, left, back, right, top, bottom}
    (reference utils.py:15-40). Host-side numpy; returns int array."""
    thetas = np.atleast_1d(np.asarray(thetas, np.float64))
    phis = np.atleast_1d(np.asarray(phis, np.float64))
    res = np.zeros(thetas.shape[0], dtype=np.int64)
    res[(phis >= (2 * np.pi - front / 2)) & (phis < front / 2)] = 0
    res[(phis >= front / 2) & (phis < (np.pi - front / 2))] = 1
    res[(phis >= (np.pi - front / 2)) & (phis < (np.pi + front / 2))] = 2
    res[(phis >= (np.pi + front / 2)) & (phis < (2 * np.pi - front / 2))] = 3
    res[thetas <= overhead] = 4
    res[thetas >= (np.pi - overhead)] = 5
    return res


def get_nonzero_region_tuple(mask: np.ndarray) -> Tuple[int, int, int, int]:
    """Square bbox with 10% margin around the mask (reference utils.py:92-113).

    mask: (H, W) host array. Returns (min_h, min_w, max_h, max_w) ints."""
    mask = np.asarray(mask)
    nz = np.nonzero(mask)
    min_h, max_h = int(nz[0].min()), int(nz[0].max())
    min_w, max_w = int(nz[1].min()), int(nz[1].max())
    size = max(max_h - min_h + 1, max_w - min_w + 1) * 1.1
    h_start = min_h - (size - (max_h - min_h + 1)) / 2
    w_start = min_w - (size - (max_w - min_w + 1)) / 2
    min_h = max(0, int(h_start))
    min_w = max(0, int(w_start))
    max_h = min(mask.shape[0], int(min_h + size))
    max_w = min(mask.shape[1], int(min_w + size))
    return min_h, min_w, max_h, max_w


def pad_tensor_to_size(x: jnp.ndarray, target_h: int, target_w: int,
                       value: float = 1.0) -> jnp.ndarray:
    """Center-pad last two dims (reference utils.py:280-297)."""
    h, w = x.shape[-2], x.shape[-1]
    ph, pw = target_h - h, target_w - w
    pads = [(0, 0)] * (x.ndim - 2) + [(ph // 2, ph - ph // 2),
                                      (pw // 2, pw - pw // 2)]
    return jnp.pad(x, pads, constant_values=value)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (B,C,H,W), matching F.interpolate(align_corners=False)."""
    B, C, H, W = x.shape
    out = jax.image.resize(x, (B, C, out_h, out_w), method="linear")
    return out


def crop_and_resize(x: jnp.ndarray, bbox: Tuple[int, int, int, int],
                    out_h: int, out_w: int) -> jnp.ndarray:
    """Static crop (Python-int bbox) + bilinear resize — the jit-safe
    equivalent of the reference's crop + F.interpolate
    (trainer.py:716-719)."""
    min_h, min_w, max_h, max_w = bbox
    return resize_bilinear(x[:, :, min_h:max_h, min_w:max_w], out_h, out_w)


def gaussian_kernel_2d(kernlen: int, std: float) -> jnp.ndarray:
    """2D Gaussian kernel (reference utils.py:234-245)."""
    n = jnp.arange(0, kernlen) - (kernlen - 1.0) / 2.0
    w = jnp.exp(-(n ** 2) / (2 * std * std))
    k2 = jnp.outer(w, w)
    return k2


def gaussian_blur(image: jnp.ndarray, kernel_size: int, std: float) -> jnp.ndarray:
    """Depthwise Gaussian blur of (B,1,H,W) (reference utils.py:248-254)."""
    k = gaussian_kernel_2d(kernel_size, std)
    k = k / k.sum()
    k = k[None, None]  # (1,1,kh,kw)
    return jax.lax.conv_general_dilated(
        image, k, window_strides=(1, 1),
        padding=[(kernel_size // 2,) * 2] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def color_with_shade(color: List[float], z_normals: jnp.ndarray,
                     light_coef: float = 0.7) -> jnp.ndarray:
    """Lambertian-ish shading of a flat color (reference utils.py:257-261)."""
    normals_with_light = light_coef + (1 - light_coef) * jax.lax.stop_gradient(
        z_normals)
    return jnp.asarray(color).reshape(1, 3, 1, 1) * normals_with_light


def smooth_image(img: jnp.ndarray, sigma: float,
                 kernel_size: int = 51) -> jnp.ndarray:
    """Gaussian blur of a (C,H,W) image (reference smooth_image,
    utils.py:86-89: GaussianBlur(51, sigma))."""
    return gaussian_blur(img[:, None], kernel_size, sigma)[:, 0]


def save_colormap(arr: np.ndarray, path) -> None:
    """Save a (H,W) scalar map through the seismic colormap (reference
    save_colormap, utils.py:69-70); falls back to a grayscale PNG when
    matplotlib is unavailable."""
    from PIL import Image

    arr = np.asarray(arr, np.float32)
    try:
        from matplotlib import cm

        rgb = (cm.seismic(arr)[:, :, :3] * 255).astype(np.uint8)
    except ImportError:
        g = np.clip(arr, 0.0, 1.0)
        rgb = np.stack([(g * 255).astype(np.uint8)] * 3, axis=-1)
    Image.fromarray(rgb).save(path)


def get_nonzero_region_vectorized(masks: np.ndarray) -> np.ndarray:
    """Batched square-bbox-with-margin (reference
    get_nonzero_region_vectorized, utils.py:140-181). masks: (B,H,W) host
    arrays -> (B,4) int [min_h, min_w, max_h, max_w]."""
    masks = np.asarray(masks)
    return np.stack([np.asarray(get_nonzero_region_tuple(m), np.int64)
                     for m in masks])


def crop_img_to_bounding_box(img: jnp.ndarray,
                             bounding_boxes: np.ndarray) -> jnp.ndarray:
    """Crop each batch image to its bbox, top-left aligned into a common
    (max_h, max_w) canvas with background 1 (reference
    crop_img_to_bounding_box, utils.py:190-220)."""
    boxes = np.asarray(bounding_boxes)
    max_h = int((boxes[:, 2] - boxes[:, 0]).max())
    max_w = int((boxes[:, 3] - boxes[:, 1]).max())
    B, C = img.shape[0], img.shape[1]
    out = jnp.ones((B, C, max_h, max_w), img.dtype)
    for i in range(B):
        min_h, min_w, mh, mw = (int(v) for v in boxes[i])
        h, w = mh - min_h, mw - min_w
        out = out.at[i, :, :h, :w].set(img[i, :, min_h:mh, min_w:mw])
    return out


def seed_everything(seed: int) -> None:
    """Seed the host-side RNGs (reference seed_everything, utils.py:73-84).
    Device randomness in this framework is explicit jax key threading; this
    covers python/numpy used by procedural tooling and augmentations."""
    import os
    import random

    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


def tensor2numpy(x: jnp.ndarray) -> np.ndarray:
    """Device -> uint8 image with NaN/Inf guard (reference utils.py:43-61)."""
    arr = np.asarray(x)
    if np.any(np.isnan(arr)) or np.any(np.isinf(arr)):
        raise ValueError(
            "Tensor contains NaNs or infinite values, which cannot be "
            "converted to np.uint8.")
    return (arr * 255).astype(np.uint8)
