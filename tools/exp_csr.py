"""Microbenchmark: what inside pose_routing costs 7.4 ms/frame.

Synthetic-but-realistic inputs (1024^2 scene geometry: 3 grids, 3072
chunks, 6144 (chunk, cluster) entries, 32 tiles) so the experiment
compiles in seconds instead of minutes. Times, per pose under a lax.map
like the pipeline's frame loop:

  * bounds     — the fused plane projection + 8 masked chunk reductions
  * csr_sort   — _build_csr as shipped (196k-key lax.sort)
  * csr_bs     — sort-free variant (cumsum + 18-step binary search)
  * over_sort  — the over_ids argsort epilogue
  * over_bs    — sort-free variant
  * routing    — full pose_routing as shipped

Usage: python tools/exp_csr.py [n_poses]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    del out
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def nth_set_bit(csum, k):
    """Flat index of the k-th set bit given the INCLUSIVE cumsum of 0/1
    flags; returns N when k >= total. 12k queries x log2(N) gathers."""
    n = csum.shape[0]
    lo = jnp.zeros_like(k)
    hi = jnp.full_like(k, n)
    # search space [0, n] has n+1 candidates -> ceil(log2(n+1)) halvings
    # (log2(n) is one short when n is an exact power of two)
    for _ in range(max(1, int(np.ceil(np.log2(n + 1))))):
        mid = (lo + hi) // 2
        v = jnp.take(csum, mid)  # clips at n-1; v < k+1 there when k >= total
        go_right = v < k + 1
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from kbe_tpu.ops.splat_posed import BandedScene, pose_routing
    from kbe_tpu.ops.splat_routed import _INF, _build_csr
    from kbe_tpu.ops.splat_banded import CHUNK_H, CHUNK_W, TILE_H, TILE_W

    h = w = 1024
    g = 3
    nc = g * (h // CHUNK_H) * (w // CHUNK_W)
    ne = nc * 2
    n_ty = -(-h // TILE_H)
    n_tx = -(-w // TILE_W)
    capacity = 4 * nc

    rng = np.random.default_rng(0)
    # realistic bboxes: chunk origin + small displacement, ~8px spread
    cy = (rng.integers(0, h // CHUNK_H, ne) * CHUNK_H).astype(np.float32)
    cx = (rng.integers(0, w // CHUNK_W, ne) * CHUNK_W).astype(np.float32)
    du = rng.uniform(-40, 40, ne).astype(np.float32)
    dv = rng.uniform(-40, 40, ne).astype(np.float32)
    su = rng.uniform(0, 8, ne).astype(np.float32)
    sv = rng.uniform(0, 8, ne).astype(np.float32)
    minu = jnp.asarray(cx + du)
    maxu = jnp.asarray(cx + du + su + CHUNK_W - 1)
    minv = jnp.asarray(cy + dv)
    maxv = jnp.asarray(cy + dv + sv + CHUNK_H - 1)
    overwork = jnp.asarray(rng.uniform(0, 1, ne) < 0.01)

    poses = jnp.arange(n_poses, dtype=jnp.float32)

    def under_map(body):
        return jax.jit(lambda xs: lax.map(body, xs))

    # --- csr as shipped
    def csr_sort(p):
        ids, offs, ovf, _ = _build_csr(minu + p, maxu + p, minv, maxv,
                                       n_ty, n_tx, capacity, TILE_H,
                                       TILE_W)
        return jnp.sum(ids) + jnp.sum(offs) + ovf

    # --- csr via binary search
    _HALO_LO = 3
    _HALO_HI = 4

    def csr_bs(p):
        mu, xu, mv, xv = minu + p, maxu + p, minv, maxv
        t = n_ty * n_tx
        ty = jnp.arange(n_ty, dtype=jnp.float32) * TILE_H
        tx = jnp.arange(n_tx, dtype=jnp.float32) * TILE_W
        hit_y = ((xv[None, :] >= ty[:, None] - (_HALO_LO + 1.0))
                 & (mv[None, :] <= ty[:, None] + TILE_H + _HALO_HI))
        hit_x = ((xu[None, :] >= tx[:, None] - (_HALO_LO + 1.0))
                 & (mu[None, :] <= tx[:, None] + TILE_W + _HALO_HI))
        hit = (hit_y[:, None, :] & hit_x[None, :, :]).reshape(t, ne)
        cnt = jnp.sum(hit, axis=1, dtype=jnp.int32)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)])
        overflow = offsets[-1] > capacity
        offsets = jnp.minimum(offsets, capacity)
        csum = jnp.cumsum(hit.reshape(-1).astype(jnp.int32))
        k = jnp.arange(capacity, dtype=jnp.int32)
        idx = nth_set_bit(csum, k)
        ids = jnp.where(idx >= t * ne, 0, idx % ne)
        return jnp.sum(ids) + jnp.sum(offsets) + overflow

    # --- over_ids variants
    def over_sort(p):
        ow = overwork ^ (p > 1e9)  # depend on p
        ids = jnp.argsort(jnp.logical_not(ow)).astype(jnp.int32)[:256]
        return jnp.sum(ids)

    def over_bs(p):
        ow = overwork ^ (p > 1e9)
        csum = jnp.cumsum(ow.astype(jnp.int32))
        k = jnp.arange(256, dtype=jnp.int32)
        idx = nth_set_bit(csum, k)
        ids = jnp.where(idx >= ne, 0, idx).astype(jnp.int32)
        return jnp.sum(ids)

    # --- bounds prepass (synthetic planes) + full pose_routing
    px = jnp.asarray(rng.uniform(-300, 300, (g, h, w)), jnp.float32)
    py = jnp.asarray(rng.uniform(-300, 300, (g, h, w)), jnp.float32)
    pz = jnp.asarray(rng.uniform(50, 500, (g, h, w)), jnp.float32)
    pv = jnp.asarray(rng.uniform(0, 1, (g, h, w)) < 0.9, jnp.float32)
    pcl = jnp.asarray(rng.uniform(0, 1, (g, h, w)) < 0.2, jnp.float32)
    rec = jnp.zeros((nc, 9 * CHUNK_H, CHUNK_W), jnp.float32)
    cid = jnp.arange(nc, dtype=jnp.int32)
    nxc = w // CHUNK_W
    yy0 = (((cid % (h // CHUNK_H * nxc)) // nxc) * CHUNK_H).astype(
        jnp.float32)
    xx0 = ((cid % nxc) * CHUNK_W).astype(jnp.float32)
    scene = BandedScene(rec, px, py, pz, pv, pcl, xx0, yy0)

    def routing(p):
        r = pose_routing(scene, jnp.stack([p, p * 0.5, p * 0.1]), 512.0,
                         h, w, overflow_cap=256)
        return (jnp.sum(r.chunk_ids) + jnp.sum(r.offsets)
                + jnp.sum(r.meta1) + jnp.sum(r.meta2))

    def bounds_only(p):
        sx, sy, sz = p, p * 0.5, p * 0.1
        xs_ = px + sx
        ys_ = py + sy
        zs = pz + sz
        okb = (zs >= 1e-3 - 1e-6) & (pv > 0.0)
        safez = jnp.where(okb, zs, 1.0)
        yyg = lax.broadcasted_iota(jnp.float32, (g, h, w), 1)
        xxg = lax.broadcasted_iota(jnp.float32, (g, h, w), 2)
        u = (xs_ * 512.0 / safez + (0.5 * w)) - 0.5
        v = (ys_ * 512.0 / safez + (0.5 * h)) - 0.5
        cdx = u - xxg
        cdy = v - yyg

        def chunk_red(x, ok, red, fill):
            x = jnp.where(ok, x, fill)
            x = x.reshape(g, h // CHUNK_H, CHUNK_H, w // CHUNK_W, CHUNK_W)
            return red(x, axis=(2, 4)).reshape(-1)

        big = jnp.float32(3e38)
        out = 0.0
        for want in (0.0, 1.0):
            ok_c = okb & (pcl == want)
            out = out + (jnp.sum(chunk_red(cdx, ok_c, jnp.min, big))
                         + jnp.sum(chunk_red(cdx, ok_c, jnp.max, -big))
                         + jnp.sum(chunk_red(cdy, ok_c, jnp.min, big))
                         + jnp.sum(chunk_red(cdy, ok_c, jnp.max, -big)))
        return out

    for name, body in (("bounds", bounds_only), ("csr_sort", csr_sort),
                       ("csr_bs", csr_bs), ("over_sort", over_sort),
                       ("over_bs", over_bs), ("routing", routing)):
        ms = timeit(under_map(body), poses) / n_poses
        print(f"{name:10s} {ms:8.3f} ms/pose", flush=True)


if __name__ == "__main__":
    main()
