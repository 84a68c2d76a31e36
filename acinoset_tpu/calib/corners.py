"""Checkerboard corner detection: JAX image kernels + lattice recovery.

TPU-native replacement for cv2.findChessboardCorners + cornerSubPix as
used by the reference (AcinoSet src/calib/points.py:24-43). The
pixel-dense work — grayscale, Gaussian smoothing, saddle-point (X-corner)
response, non-max suppression, and the gradient-orthogonality subpixel
refinement — is batched JAX (conv/gather ops). The tiny combinatorial
step — growing the (h, w) lattice out of ~60 candidate points — runs on
host NumPy.

Corner response: checkerboard inner corners are *saddle points* of the
intensity surface; we use -det(Hessian) (positive at saddles), masked by
local contrast. Subpixel refinement solves cv2.cornerSubPix's criterion
sum_p (grad I(p) grad I(p)^T)(p - c) = 0 over a window, iterated with
bilinear sampling.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Dense image ops (JAX)
# --------------------------------------------------------------------------


def _gauss_kernel1d(sigma: float, radius: int, dtype):
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _sep_conv(img, k):
    """Separable 2D convolution with a 1D kernel (same padding)."""
    pad = (k.shape[0] - 1) // 2
    img_p = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    # conv along axis 0 and 1 via correlate, vmapped over rows/cols
    conv0 = jax.vmap(lambda col: jnp.correlate(col, k, mode="valid"), in_axes=1, out_axes=1)(
        img_p
    )
    img_p2 = jnp.pad(conv0, ((0, 0), (pad, pad)), mode="edge")
    conv1 = jax.vmap(lambda row: jnp.correlate(row, k, mode="valid"))(img_p2)
    return conv1


def saddle_response(gray: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """-det(Hessian) of the smoothed image; positive at X-corners."""
    dtype = gray.dtype
    k = _gauss_kernel1d(sigma, int(3 * sigma), dtype)
    g = _sep_conv(gray, k)
    # central-difference derivatives
    gx = (jnp.roll(g, -1, 1) - jnp.roll(g, 1, 1)) / 2.0
    gy = (jnp.roll(g, -1, 0) - jnp.roll(g, 1, 0)) / 2.0
    gxx = jnp.roll(g, -1, 1) - 2 * g + jnp.roll(g, 1, 1)
    gyy = jnp.roll(g, -1, 0) - 2 * g + jnp.roll(g, 1, 0)
    gxy = (jnp.roll(gx, -1, 0) - jnp.roll(gx, 1, 0)) / 2.0
    resp = -(gxx * gyy - gxy * gxy)
    # suppress plain edges: saddle needs both curvatures significant
    return jnp.maximum(resp, 0.0)


def _maxpool_same(x, size):
    """Max filter with 'same' extent via repeated roll-max (size odd)."""
    r = size // 2
    out = x
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            out = jnp.maximum(out, jnp.roll(jnp.roll(x, dy, 0), dx, 1))
    return out


def find_corner_candidates(
    gray: jnp.ndarray, max_corners: int = 256, sigma: float = 2.0, nms_size: int = 9
):
    """Return (xy (K, 2) float coords, scores (K,)) of NMS peaks, sorted
    by descending response. Fixed K = max_corners (pad with score 0)."""
    resp = saddle_response(gray, sigma)
    pooled = _maxpool_same(resp, nms_size)
    is_peak = (resp >= pooled) & (resp > 0)
    # exclude a small image border
    H, W = resp.shape
    b = 8
    border = jnp.zeros_like(is_peak).at[b:-b, b:-b].set(True)
    score = jnp.where(is_peak & border, resp, 0.0)
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_corners)
    ys = (idx // W).astype(gray.dtype)
    xs = (idx % W).astype(gray.dtype)
    return jnp.stack([xs, ys], axis=1), vals


def _bilinear(img, xy):
    """Bilinear sample img at float (x, y) points (..., 2)."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def refine_subpixel(
    gray: jnp.ndarray, corners: jnp.ndarray, win: int = 5, iters: int = 10
) -> jnp.ndarray:
    """cornerSubPix-style refinement of corner locations (K, 2)."""
    dtype = gray.dtype
    k = _gauss_kernel1d(1.5, 4, dtype)
    g = _sep_conv(gray, k)
    gx_img = (jnp.roll(g, -1, 1) - jnp.roll(g, 1, 1)) / 2.0
    gy_img = (jnp.roll(g, -1, 0) - jnp.roll(g, 1, 0)) / 2.0

    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-win, win + 1, dtype=dtype), jnp.arange(-win, win + 1, dtype=dtype)
        ),
        axis=-1,
    ).reshape(-1, 2)  # (W2, 2) as (dx, dy)
    # Gaussian window weights like cv2
    ww = jnp.exp(-0.5 * jnp.sum((offs / (win * 0.5)) ** 2, axis=1))

    def refine_one(c):
        def body(_, c):
            p = c[None, :] + offs  # (W2, 2)
            gx = _bilinear(gx_img, p)
            gy = _bilinear(gy_img, p)
            a = jnp.sum(ww * gx * gx)
            b2 = jnp.sum(ww * gx * gy)
            cc = jnp.sum(ww * gy * gy)
            bx = jnp.sum(ww * (gx * gx * p[:, 0] + gx * gy * p[:, 1]))
            by = jnp.sum(ww * (gx * gy * p[:, 0] + gy * gy * p[:, 1]))
            A = jnp.array([[a, b2], [b2, cc]], dtype=dtype)
            det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
            sol = jnp.linalg.solve(A + 1e-9 * jnp.eye(2, dtype=dtype), jnp.stack([bx, by]))
            return jnp.where(jnp.abs(det) > 1e-9, sol, c)

        return jax.lax.fori_loop(0, iters, body, c)

    return jax.vmap(refine_one)(corners)


# --------------------------------------------------------------------------
# Lattice recovery (host NumPy — tiny combinatorial problem)
# --------------------------------------------------------------------------


def _grow_grid(cands: np.ndarray, scores: np.ndarray, board_shape: Tuple[int, int]):
    """Grow an (h x w) lattice through candidate points.

    Returns (grid (h, w, 2), ok). Greedy BFS from multiple seeds (in
    descending response order): estimate two roughly-orthogonal short
    lattice vectors among a seed's neighbors, then extrapolate
    cell-by-cell (p[i+1] ~ 2p[i] - p[i-1]) snapping to the nearest
    candidate. The first seed whose lattice reaches the full board wins.
    """
    want_h, want_w = board_shape
    n_need = want_h * want_w
    keep = scores > 0
    pts = cands[keep]
    pts_scores = scores[keep]
    if len(pts) < n_need:
        return None, False

    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    order = np.argsort(-pts_scores)
    for seed in order[: min(len(order), 40)]:
        out = _grow_from_seed(pts, pts_scores, tree, int(seed), want_h, want_w, n_need)
        if out is not None:
            return out, True
    return None, False


def _grow_from_seed(pts, pts_scores, tree, seed, want_h, want_w, n_need):
    d, nn = tree.query(pts[seed], k=min(9, len(pts)))
    neigh = pts[nn[1:]] - pts[seed]
    lens = np.linalg.norm(neigh, axis=1)
    v1 = neigh[np.argmin(lens)]
    cosang = np.abs(neigh @ v1) / (lens * np.linalg.norm(v1) + 1e-9)
    cand2 = np.where((cosang < 0.5) & (lens < 2.0 * np.linalg.norm(v1)))[0]
    if len(cand2) == 0:
        return None
    v2 = neigh[cand2[np.argmin(lens[cand2])]]

    placed = {(0, 0): seed}
    pos = {(0, 0): pts[seed]}
    frontier = [(0, 0)]
    used = {seed}
    max_cells = 4 * n_need

    def predict(cell):
        i, j = cell
        ests = []
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            a, b = (i - di, j - dj), (i - 2 * di, j - 2 * dj)
            if a in pos and b in pos:
                ests.append(2 * pos[a] - pos[b])
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            a = (i - di, j - dj)
            if a in pos and not ests:
                base = v1 * di + v2 * dj
                ests.append(pos[a] + base)
        if not ests:
            return None
        return np.mean(ests, axis=0)

    while frontier and len(placed) < max_cells:
        cell = frontier.pop(0)
        i, j = cell
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nxt = (i + di, j + dj)
            if nxt in pos:
                continue
            est = predict(nxt)
            if est is None:
                continue
            dist, k = tree.query(est)
            # local spacing estimate
            spacing = np.linalg.norm(v1) if di else np.linalg.norm(v2)
            near = pos.get(cell)
            if near is not None:
                spacing = max(np.linalg.norm(est - near) * 0.999, 1e-3)
            if dist < 0.35 * spacing and k not in used:
                pos[nxt] = pts[k]
                placed[nxt] = k
                used.add(k)
                frontier.append(nxt)

    if len(placed) < n_need:
        return None

    # among all fully-populated (h, w)/(w, h) sub-windows, keep the one
    # with the smoothest lattice (smallest max second difference) —
    # rejects windows that wandered onto off-board candidates
    cells = np.array(list(pos.keys()))
    imin, jmin = cells.min(axis=0)
    imax, jmax = cells.max(axis=0)
    candidates = []
    for (hh, ww) in ((want_h, want_w), (want_w, want_h)):
        for i0 in range(imin, imax - hh + 2):
            for j0 in range(jmin, jmax - ww + 2):
                window = [(i0 + a, j0 + b) for a in range(hh) for b in range(ww)]
                if all(c in pos for c in window):
                    grid = np.array([pos[c] for c in window]).reshape(hh, ww, 2)
                    resp = float(sum(pts_scores[placed[c]] for c in window))
                    if (hh, ww) != (want_h, want_w):
                        grid = grid.transpose(1, 0, 2)
                    candidates.append((_lattice_roughness(grid), -resp, len(candidates), grid))
    if not candidates:
        return None
    # true inner corners carry the strongest saddle response: among
    # windows that are comparably smooth (shift-ambiguous lattices
    # extending past the board edge), take the highest total response
    best_rough = min(c[0] for c in candidates)
    pool = [c for c in candidates if c[0] <= max(1.5 * best_rough, best_rough + 1.0)]
    pool.sort(key=lambda c: c[1])
    return _repair_lattice_outliers(pool[0][3])


def _lattice_roughness(grid: np.ndarray) -> float:
    """Max second-difference magnitude across both lattice axes."""
    d2i = grid[2:] - 2 * grid[1:-1] + grid[:-2]
    d2j = grid[:, 2:] - 2 * grid[:, 1:-1] + grid[:, :-2]
    return max(np.abs(d2i).max(initial=0.0), np.abs(d2j).max(initial=0.0))


def _repair_lattice_outliers(grid: np.ndarray, spike_factor: float = 4.0) -> np.ndarray:
    """Replace cells that spike the lattice Laplacian with smooth
    extrapolations from their neighbors (subpixel refinement then pulls
    them onto the true corner)."""
    h, w, _ = grid.shape
    lap = np.zeros((h, w))
    d2i = grid[2:] - 2 * grid[1:-1] + grid[:-2]
    d2j = grid[:, 2:] - 2 * grid[:, 1:-1] + grid[:, :-2]
    lap[1:-1] += np.linalg.norm(d2i, axis=-1)
    lap[:, 1:-1] += np.linalg.norm(d2j, axis=-1)
    med = np.median(lap[lap > 0]) if (lap > 0).any() else 0.0
    bad = lap > spike_factor * max(med, 0.5)
    if not bad.any():
        return grid
    out = grid.copy()
    for i, j in zip(*np.where(bad)):
        ests = []
        if 1 <= i <= h - 2 and not bad[i - 1, j] and not bad[i + 1, j]:
            ests.append(0.5 * (grid[i - 1, j] + grid[i + 1, j]))
        if 1 <= j <= w - 2 and not bad[i, j - 1] and not bad[i, j + 1]:
            ests.append(0.5 * (grid[i, j - 1] + grid[i, j + 1]))
        if i >= 2 and not bad[i - 1, j] and not bad[i - 2, j]:
            ests.append(2 * grid[i - 1, j] - grid[i - 2, j])
        if i <= h - 3 and not bad[i + 1, j] and not bad[i + 2, j]:
            ests.append(2 * grid[i + 1, j] - grid[i + 2, j])
        if j >= 2 and not bad[i, j - 1] and not bad[i, j - 2]:
            ests.append(2 * grid[i, j - 1] - grid[i, j - 2])
        if j <= w - 3 and not bad[i, j + 1] and not bad[i, j + 2]:
            ests.append(2 * grid[i, j + 1] - grid[i, j + 2])
        if ests:
            out[i, j] = np.mean(ests, axis=0)
    return out


def _canonicalize(grid: np.ndarray) -> np.ndarray:
    """Deterministic corner ordering: first corner is the lattice corner
    closest to the image origin; rows advance along the board's first
    axis. Resolves the detector's 4-fold orientation ambiguity."""
    h, w, _ = grid.shape
    corners4 = [grid[0, 0], grid[0, -1], grid[-1, 0], grid[-1, -1]]
    which = int(np.argmin([np.hypot(*c) for c in corners4]))
    if which == 1:
        grid = grid[:, ::-1]
    elif which == 2:
        grid = grid[::-1, :]
    elif which == 3:
        grid = grid[::-1, ::-1]
    return np.ascontiguousarray(grid)


def find_corners(
    image: np.ndarray,
    board_shape: Tuple[int, int],
    sigma: float = 2.0,
    max_candidates: int = 256,
) -> Tuple[Optional[np.ndarray], bool]:
    """Detect an (h, w) checkerboard in an image.

    Twin of src/calib/points.py:24-41. image: (H, W[, 3]) uint8/float.
    Returns (corners (board_shape[0], board_shape[1], 2) float64, found).
    """
    img = np.asarray(image)
    if img.ndim == 3:
        img = img @ np.array([0.114, 0.587, 0.299])  # BGR luminance
    gray = jnp.asarray(img / 255.0 if img.max() > 2 else img, jnp.float32)

    cand, scores = find_corner_candidates(gray, max_corners=max_candidates, sigma=sigma)
    grid, ok = _grow_grid(np.asarray(cand), np.asarray(scores), board_shape)
    if not ok:
        return None, False
    refined = refine_subpixel(gray, jnp.asarray(grid.reshape(-1, 2), jnp.float32))
    grid = _canonicalize(np.asarray(refined, np.float64).reshape(grid.shape))
    return grid, True


def find_corners_images(
    image_paths: List[str],
    board_shape: Tuple[int, int],
    verbose: bool = True,
    engine: str = "auto",
):
    """Batch detection over image files (twin of src/calib/points.py:44-69).

    engine: 'auto' uses the multithreaded C++ engine
    (native/corners.cpp via calib.native) when built, else the JAX path;
    'native' requires it; 'jax' forces the pure-JAX detector.
    Returns (points (F, h, w, 2), found_fnames, shape)."""
    import imageio.v2 as imageio
    import os

    imgs = [imageio.imread(p) for p in image_paths]
    shape = imgs[0].shape[:2] if imgs else (0, 0)
    for im in imgs:
        assert im.shape[:2] == shape, "Inconsistent image resolutions"

    use_native = False
    if engine in ("auto", "native"):
        from . import native as native_mod

        use_native = native_mod.available()
        if engine == "native" and not use_native:
            raise RuntimeError("native engine requested but library not built")

    pts, names = [], []
    if use_native:
        from . import native as native_mod

        grids, found = native_mod.find_corners_batch(imgs, board_shape)
        for p, g, ok in zip(image_paths, grids, found):
            if ok:
                pts.append(g)
                names.append(os.path.basename(p))
                if verbose:
                    print(f"Found corners in {p}")
            elif verbose:
                print(f"No checkerboard in {p}")
    else:
        for p, img in zip(image_paths, imgs):
            corners, ok = find_corners(img, board_shape)
            if ok:
                pts.append(corners)
                names.append(os.path.basename(p))
                if verbose:
                    print(f"Found corners in {p}")
            elif verbose:
                print(f"No checkerboard in {p}")
    return np.array(pts), names, (shape[1], shape[0])
