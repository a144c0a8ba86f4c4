"""Zero123++ 3x2 grid packing (reference: src/utils.py:299-370).

The Zero123++ canvas is a 3-row x 2-col grid of view tiles (320 px or 40
latent). The reference's column-major tile order is preserved:
    col0 holds views 0,1,2 (rows 0..2), col1 holds views 3,4,5
(utils.py:326-347: idx = num_rows * col + row).
All functions are pure reshape/transpose — fused away by XLA, unlike the
reference's per-tile Python slicing loops.
"""

from __future__ import annotations

import jax.numpy as jnp

_ROWS, _COLS = 3, 2


def merge_6_to_grid(components: jnp.ndarray, tile_size: int = None) -> jnp.ndarray:
    """(6, C, t, t) -> (1, C, 3t, 2t), column-major tile order
    (reference merge_tensor_with_6_elements_to_3x2_grid, utils.py:326-347)."""
    n, C, t, _ = components.shape
    assert n == _ROWS * _COLS
    x = components.reshape(_COLS, _ROWS, C, t, t)
    x = jnp.transpose(x, (2, 1, 3, 0, 4))  # (C, rows, t, cols, t)
    return x.reshape(1, C, _ROWS * t, _COLS * t)


def split_grid_to_6(grid: jnp.ndarray, tile_size: int) -> jnp.ndarray:
    """(1, C, 3t, 2t) -> (6, C, t, t), column-major tile order
    (reference split_3x2_grid_to_tensor_with_6_elements, utils.py:349-370)."""
    _, C, H, W = grid.shape
    t = tile_size
    assert H == _ROWS * t and W == _COLS * t
    x = grid.reshape(C, _ROWS, t, _COLS, t)
    x = jnp.transpose(x, (3, 1, 0, 2, 4))  # (cols, rows, C, t, t)
    return x.reshape(_ROWS * _COLS, C, t, t)


def split_zero123plus_grid(grid: jnp.ndarray, tile_size: int):
    """Nested [row][col] tile list (reference split_zero123plus_grid,
    utils.py:299-323). Kept for API parity; prefer split_grid_to_6."""
    out = []
    for row in range(_ROWS):
        out_row = []
        for col in range(_COLS):
            sl_r = slice(row * tile_size, (row + 1) * tile_size)
            sl_c = slice(col * tile_size, (col + 1) * tile_size)
            out_row.append(grid[..., sl_r, sl_c])
        out.append(out_row)
    return out
