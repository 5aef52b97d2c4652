"""Compare grid_sample forward formulations on TPU.

The bilinear gather is the serving path's #1 cost (~5 ms per 480x640
call, round-1 bisection). TPU has no gather hardware: XLA lowers a gather
to dynamic-slice streams whose cost scales with the NUMBER OF INDICES far
more than with bytes per index. Variants, all numerically identical to
ops.sampler.grid_sample (asserted here):

  stacked4: the ROUND-1 formulation, re-implemented here verbatim so the
            comparison stays reproducible — ONE gather, 4 indices/sample,
            each fetching a C-vector. (Production _corner_gather now uses
            the footprint form, so it can't be timed as the baseline.)
  production: whatever ops.sampler.grid_sample currently does (should
            match footprint1).
  span2:    flat (H*W, C) view; each index fetches a (2, C) slice covering
            the two x-adjacent corners of one row -> 2 indices/sample.
  patch1:   (H, W*C) view; each index fetches a (2, 2C) slice covering the
            whole 2x2xC bilinear footprint -> 1 index/sample. Corner
            positions inside the patch are recovered with VPU selects
            (clip(x0,0,W-2) start + offset), so zero-padding semantics are
            preserved exactly.

Usage: python scripts/bench_sampler_variants.py [--iters 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ransacflow")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--c", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ransacflow_tpu.ops.sampler import grid_sample, _unnormalize

    B, H, W, C = args.b, args.h, args.w, args.c
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    # grid: random homography-ish warp incl. out-of-range samples
    grid = jnp.asarray(
        (rng.rand(B, H, W, 2).astype(np.float32) * 2.4 - 1.2)
    )

    def stacked4(image, grid, align_corners=True):
        """Round-1 production path: 4 stacked corner indices, C per fetch."""
        B, H, W, C = image.shape
        x = _unnormalize(grid[..., 0], W, align_corners)
        y = _unnormalize(grid[..., 1], H, align_corners)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        xs = jnp.stack([x0, x0 + 1.0, x0, x0 + 1.0])  # (4, B, Ho, Wo)
        ys = jnp.stack([y0, y0, y0 + 1.0, y0 + 1.0])
        xi = xs.astype(jnp.int32)
        yi = ys.astype(jnp.int32)
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = (yc * W + xc).reshape(4, B, -1)
        vals = jnp.take_along_axis(
            image.reshape(1, B, H * W, C), flat[..., None], axis=2
        ).reshape(4, *grid.shape[:3], C)
        vals = vals * valid[..., None].astype(vals.dtype)
        fx, fy = x - x0, y - y0
        weights = jnp.stack([
            (1.0 - fx) * (1.0 - fy), fx * (1.0 - fy),
            (1.0 - fx) * fy, fx * fy,
        ])
        return jnp.sum(vals * weights[..., None].astype(vals.dtype), axis=0)

    def span2(image, grid, align_corners=True):
        B, H, W, C = image.shape
        x = _unnormalize(grid[..., 0], W, align_corners)
        y = _unnormalize(grid[..., 1], H, align_corners)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx, fy = x - x0, y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        xs = jnp.clip(x0i, 0, W - 2)  # span start, always in range
        ox = (x0i - xs).astype(jnp.float32)  # 0 normally, 1 at right edge

        flat = image.reshape(B, H * W, C)
        # rows y0 and y0+1, clamped; each index fetches (2, C): x and x+1
        rows = []
        for dy in (0, 1):
            yc = jnp.clip(y0i + dy, 0, H - 1)
            idx = (yc * W + xs).reshape(B, -1)  # (B, P)

            def g(img2d, ix):
                return jax.vmap(
                    lambda i: jax.lax.dynamic_slice(img2d, (i, 0), (2, C))
                )(ix)

            rows.append(jax.vmap(g)(flat, idx))  # (B, P, 2, C)
        top, bot = rows  # positions 0/1 = xs, xs+1

        def corner(row, dx):
            px = jnp.clip(x0i + dx - xs, 0, 1).reshape(B, -1)
            return jnp.where(
                (px == 0)[..., None], row[:, :, 0, :], row[:, :, 1, :]
            )

        v00, v10 = corner(top, 0), corner(top, 1)
        v01, v11 = corner(bot, 0), corner(bot, 1)

        def m(dx, dy):
            xi = x0i + dx
            yi = y0i + dy
            return (
                ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
                .astype(jnp.float32)
                .reshape(B, -1)[..., None]
            )

        shp = (*grid.shape[:3], C)
        fxr = fx.reshape(B, -1)[..., None]
        fyr = fy.reshape(B, -1)[..., None]
        out = (
            v00 * m(0, 0) * (1 - fxr) * (1 - fyr)
            + v10 * m(1, 0) * fxr * (1 - fyr)
            + v01 * m(0, 1) * (1 - fxr) * fyr
            + v11 * m(1, 1) * fxr * fyr
        )
        return out.reshape(shp)

    def patch1(image, grid, align_corners=True):
        B, H, W, C = image.shape
        x = _unnormalize(grid[..., 0], W, align_corners)
        y = _unnormalize(grid[..., 1], H, align_corners)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx, fy = x - x0, y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        xs = jnp.clip(x0i, 0, W - 2).reshape(B, -1)
        ys = jnp.clip(y0i, 0, H - 2).reshape(B, -1)

        wide = image.reshape(B, H, W * C)

        def g(img2d, iy, ix):
            return jax.vmap(
                lambda yy, xx: jax.lax.dynamic_slice(
                    img2d, (yy, xx * C), (2, 2 * C)
                )
            )(iy, ix)

        patch = jax.vmap(g)(wide, ys, xs).reshape(B, -1, 2, 2, C)

        px = jnp.clip(x0i.reshape(B, -1)[:, :, None] - xs[:, :, None]
                      + jnp.array([0, 1]), 0, 1)  # (B, P, 2)
        py = jnp.clip(y0i.reshape(B, -1)[:, :, None] - ys[:, :, None]
                      + jnp.array([0, 1]), 0, 1)

        def corner(dy, dx):
            sel_y = jnp.where(
                (py[:, :, dy] == 0)[..., None, None],
                patch[:, :, 0], patch[:, :, 1],
            )  # (B, P, 2, C)
            return jnp.where(
                (px[:, :, dx] == 0)[..., None],
                sel_y[:, :, 0], sel_y[:, :, 1],
            )  # (B, P, C)

        def m(dx, dy):
            xi = x0i + dx
            yi = y0i + dy
            return (
                ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
                .astype(jnp.float32)
                .reshape(B, -1)[..., None]
            )

        fxr = fx.reshape(B, -1)[..., None]
        fyr = fy.reshape(B, -1)[..., None]
        out = (
            corner(0, 0) * m(0, 0) * (1 - fxr) * (1 - fyr)
            + corner(0, 1) * m(1, 0) * fxr * (1 - fyr)
            + corner(1, 0) * m(0, 1) * (1 - fxr) * fyr
            + corner(1, 1) * m(1, 1) * fxr * fyr
        )
        return out.reshape(*grid.shape[:3], C)

    def footprint1(image, grid, align_corners=True):
        """One slice-1 row gather per sample over a precomputed 4C
        footprint image: I4[h, w] = (I[h-1+dy, w-1+dx] for dy, dx in 2x2)
        with a zero border, so every anchor clip reproduces zero padding
        without per-corner selects. Keeps XLA's fast row-gather emitter
        (slice size 1) while cutting indices 4x."""
        B, H, W, C = image.shape
        x = _unnormalize(grid[..., 0], W, align_corners)
        y = _unnormalize(grid[..., 1], H, align_corners)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx, fy = x - x0, y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        ip = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
        i4 = jnp.concatenate(
            [
                ip[:, 0:H + 1, 0:W + 1],
                ip[:, 0:H + 1, 1:W + 2],
                ip[:, 1:H + 2, 0:W + 1],
                ip[:, 1:H + 2, 1:W + 2],
            ],
            axis=-1,
        )  # (B, H+1, W+1, 4C): pixel (h, w) holds corners of anchor h-1,w-1
        ax = jnp.clip(x0i + 1, 0, W)
        ay = jnp.clip(y0i + 1, 0, H)
        flat = (ay * (W + 1) + ax).reshape(1, B, -1)
        vals = jnp.take_along_axis(
            i4.reshape(1, B, (H + 1) * (W + 1), 4 * C),
            flat[..., None],
            axis=2,
        ).reshape(B, -1, 4, C)  # slot order (00, 10, 01, 11) in (dx, dy)

        def mvalid(dx, dy):
            xi = x0i + dx
            yi = y0i + dy
            return (
                ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
                .astype(jnp.float32)
                .reshape(B, -1)[..., None]
            )

        fxr = fx.reshape(B, -1)[..., None]
        fyr = fy.reshape(B, -1)[..., None]
        out = (
            vals[:, :, 0] * mvalid(0, 0) * (1 - fxr) * (1 - fyr)
            + vals[:, :, 1] * mvalid(1, 0) * fxr * (1 - fyr)
            + vals[:, :, 2] * mvalid(0, 1) * (1 - fxr) * fyr
            + vals[:, :, 3] * mvalid(1, 1) * fxr * fyr
        )
        return out.reshape(*grid.shape[:3], C)

    # correctness first
    gold = np.asarray(grid_sample(image, grid))
    for name, fn in [("stacked4", stacked4), ("span2", span2),
                     ("patch1", patch1), ("footprint1", footprint1)]:
        got = np.asarray(jax.jit(fn)(image, grid))
        np.testing.assert_allclose(got, gold, atol=1e-5)
        print(f"# {name} matches grid_sample")

    def timed(name, fn):
        def make(n):
            @jax.jit
            def run(img, gr):
                def body(c, _):
                    out = fn(c[0], c[1])
                    return (c[0] + 0 * out[..., :1] * 0, c[1]), jnp.sum(out)
                _, sums = jax.lax.scan(body, (img, gr), None, length=n)
                return sums[-1]
            return run

        r1, rn = make(1), make(args.iters)
        np.asarray(r1(image, grid)); np.asarray(rn(image, grid))
        t0 = time.perf_counter(); np.asarray(rn(image, grid))
        tn = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(r1(image, grid))
        t1 = time.perf_counter() - t0
        ms = (tn - t1) / (args.iters - 1) * 1000.0
        print(json.dumps({"impl": name, "ms": round(ms, 3)}))
        return ms

    timed("stacked4", stacked4)
    timed("span2", span2)
    timed("footprint1", footprint1)
    timed("production", lambda i, g2: grid_sample(i, g2))


if __name__ == "__main__":
    main()
