"""Tiny numpy simulators of the reference CUDA kernels' semantics.

These re-state, in plain per-point/per-pixel Python, the behavioural spec of
the reference's kernels (utils/common.py:434-937) so the vectorized XLA ops
can be golden-tested against them on small fixtures. For the deterministic
parts (z-buffer min, weighted accumulation, disocclusion fill) order of
operations does not matter; for the racy parts (degrid in-place update,
visibility last-writer) we fix the deterministic schedule the TPU ops
implement and document in their docstrings.
"""

import math

import numpy as np

ZFAR = 1000000.0


def project(p, h, w, focal):
    x, y, z = p
    if z < 0.001:
        return None
    return (x * focal / z + 0.5 * w - 0.5, y * focal / z + 0.5 * h - 0.5)


def corners(u, v):
    x0, y0 = math.floor(u), math.floor(v)
    pts = [(x0, y0), (x0 + 1, y0), (x0, y0 + 1), (x0 + 1, y0 + 1)]
    wts = [
        (x0 + 1 - u) * (y0 + 1 - v),
        (u - x0) * (y0 + 1 - v),
        (x0 + 1 - u) * (v - y0),
        (u - x0) * (v - y0),
    ]
    return pts, wts


def render_pointcloud_sim(points, data, h, w, focal, baseline):
    """points: (N,3), data: (N,C). Returns (C,H,W) normalized + (H,W) weight."""
    n, c = data.shape
    zee = np.full((h, w), ZFAR, np.float32)
    errs = ZFAR - (focal * baseline) / (points[:, 2] + 1e-7)
    # pass 1
    for i in range(n):
        uv = project(points[i], h, w, focal)
        if uv is None:
            continue
        pts, wts = corners(*uv)
        best = int(np.argmax(wts))  # first max == CUDA if/elif chain
        x, y = pts[best]
        if 0 <= x < w and 0 <= y < h:
            zee[y, x] = min(zee[y, x], errs[i])
    # pass 2 (degrid, reading the pre-pass buffer)
    old = zee.copy()
    for y in range(h):
        for x in range(w):
            tot, cnt = 0.0, 0
            for dx, dy in ((1, 0), (0, 1), (1, 1), (1, -1)):
                x1, y1, x2, y2 = x + dx, y + dy, x - dx, y - dy
                if not (0 <= x1 < w and 0 <= y1 < h):
                    continue
                if not (0 <= x2 < w and 0 <= y2 < h):
                    continue
                if old[y, x] >= old[y1, x1] + 1.0 and old[y, x] >= old[y2, x2] + 1.0:
                    cnt += 2
                    tot += old[y1, x1] + old[y2, x2]
            if cnt > 0:
                zee[y, x] = min(old[y, x], tot / cnt)
    # pass 3
    out = np.zeros((c + 1, h, w), np.float32)
    payload = np.concatenate([data, np.ones((n, 1), np.float32)], axis=1)
    for i in range(n):
        uv = project(points[i], h, w, focal)
        if uv is None:
            continue
        pts, wts = corners(*uv)
        for (x, y), wt in zip(pts, wts):
            if 0 <= x < w and 0 <= y < h and errs[i] <= zee[y, x] + 1.0:
                out[:, y, x] += payload[i] * wt
    rendered = out[:-1] / (out[-1:] + 1e-7)
    return rendered, out[-1]


def fill_disocclusion_sim(image, depth, max_steps=10_000):
    """image: (C,H,W), depth: (H,W). Unbounded march like the CUDA kernel."""
    c, h, w = image.shape
    out = image.copy()
    dir_x = [-1, 0, 1, 1, -1, 1, 2, 2, -2, -1, 1, 2, 3, 3, 3, 3]
    dir_y = [1, 1, 1, 0, 2, 2, 1, -1, 3, 3, 3, 3, 2, 1, -1, -2]
    dirs = []
    for dx, dy in zip(dir_x, dir_y):
        nn = math.sqrt(dx * dx + dy * dy)
        dirs.append((dx / nn, dy / nn))
    for y in range(h):
        for x in range(w):
            if depth[y, x] > 0.0:
                continue
            shortest = ZFAR
            fill = None
            for ux, uy in dirs:
                fx, fy = float(x), float(y)
                ifx = ify = 0
                for _ in range(max_steps):
                    fx -= ux
                    fy -= uy
                    ifx, ify = int(round_c(fx)), int(round_c(fy))
                    if not (0 <= ifx < w and 0 <= ify < h):
                        break
                    if depth[ify, ifx] > 0.0:
                        break
                if not (0 <= ifx < w and 0 <= ify < h):
                    continue
                tx, ty = float(x), float(y)
                itx = ity = 0
                for _ in range(max_steps):
                    tx += ux
                    ty += uy
                    itx, ity = int(round_c(tx)), int(round_c(ty))
                    if not (0 <= itx < w and 0 <= ity < h):
                        break
                    if depth[ity, itx] > 0.0:
                        break
                if not (0 <= itx < w and 0 <= ity < h):
                    continue
                dist = math.sqrt((itx - ifx) ** 2 + (ity - ify) ** 2)
                if shortest > dist:
                    if depth[ify, ifx] < depth[ity, itx]:
                        fill = (ity, itx)
                    else:
                        fill = (ify, ifx)
                    shortest = dist
            if fill is not None:
                out[:, y, x] = image[:, fill[0], fill[1]]
    return out


def round_c(v):
    """C round(): half away from zero."""
    return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)


def generate_mask_sim(points, h, w, focal, baseline):
    """Deterministic winner spec: min error per pixel, ties -> min index."""
    n = points.shape[0]
    errs = ZFAR - (focal * baseline) / (points[:, 2] + 1e-7)
    target = np.full(n, -1, np.int64)
    for i in range(n):
        uv = project(points[i], h, w, focal)
        if uv is None:
            continue
        pts, wts = corners(*uv)
        best = int(np.argmax(wts))
        x, y = pts[best]
        if 0 <= x < w and 0 <= y < h:
            target[i] = y * w + x
    mask = np.zeros(n, np.float32)
    for pix in set(t for t in target if t >= 0):
        cand = [i for i in range(n) if target[i] == pix]
        winner = min(cand, key=lambda i: (errs[i], i))
        mask[winner] = 1.0
    return mask
