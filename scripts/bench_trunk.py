"""Bisect the coarse-feature trunk: where do the ~11 ms of serving go?

Round-2 bisection (`scripts/bisect_fused.py`) showed serving is
feature-extraction-bound: the 7-scale trunk + matching is ~11 of 24 ms per
pair. This harness attributes that cost and A/B-tests the candidate fixes:

  1. per-scale trunk timings (the top scale is 4x base pixels — is the
     pyramid cost distributed like its pixel counts?)
  2. cumulative stem / layer1 / layer2 / layer3 prefixes at the top scale
     (which depth band underutilizes the MXU?)
  3. a space-to-depth stem (the MLPerf-ResNet TPU trick: 7x7/s2 conv on
     (H, W, 3) rewritten exactly as a 4x4/s1 conv on the (H/2, W/2, 12)
     space-to-depth image — same multiply-adds, MXU-friendlier layout)
  4. padded same-shape bucketing of the 7 scale forwards (round-4 lever:
     adjacent scales zero-padded to a common shape and batched, trading
     +14% pixels for fewer, wider conv dispatches). TIMING-ONLY A/B:
     padded-border features differ from the per-scale forward (conv
     zero-padding vs explicit zero image regions diverge after the first
     BN bias), so an exactness pass — re-zeroing the padded region before
     each spatial conv — is only worth building if this wins.
  5. all of the above fp32 AND bf16 (weight dtype pulls compute dtype).

K-reps-inside-one-scan timing per CLAUDE.md (the dev tunnel makes per-call
host timing meaningless); both trip counts warmed.

Usage: python scripts/bench_trunk.py [--iters 8]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter on stage names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import pyramid_shapes
    from ransacflow_tpu.models import init_resnet50_layer3, cast_params
    from ransacflow_tpu.models.resnet50 import (
        resnet50_layer3, imagenet_preprocess, _bottleneck, _LAYERS,
        _stem_s2d as s2d_stem,
    )
    from ransacflow_tpu.models.layers import conv2d, batch_norm, max_pool

    shapes = pyramid_shapes()
    rng = np.random.RandomState(0)
    imgs = [jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
            for (h, w) in shapes]
    params32 = init_resnet50_layer3(jax.random.PRNGKey(0))
    params16 = cast_params(params32, jnp.bfloat16)

    def stem(p, x, s2d=False):
        if s2d:
            out = s2d_stem(x, p["conv1"]["weight"])
        else:
            out = conv2d(x, p["conv1"]["weight"], stride=2, padding=3)
        out, _ = batch_norm(out, p["bn1"])
        out = jax.nn.relu(out)
        return max_pool(out, window=3, stride=2, padding=1)

    def upto(p, x, depth, s2d=False):
        out = stem(p, x, s2d=s2d)
        for name, blocks, _pl, stride in _LAYERS[:depth]:
            for b in range(blocks):
                out, _ = _bottleneck(p[name][str(b)], out,
                                     stride if b == 0 else 1, False, None)
        return out

    def timed(name, fn):
        if args.only and args.only not in name:
            return

        def make(n):
            @jax.jit
            def run(key):
                def body(c, i):
                    x = fn(jax.random.fold_in(key, i))
                    return c + jnp.sum(x).astype(jnp.float32), None
                tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return tot
            return run

        r1, rn = make(1), make(args.iters)
        np.asarray(r1(jax.random.PRNGKey(0)))
        np.asarray(rn(jax.random.PRNGKey(0)))
        best = float("inf")
        for s in (1, 2):
            t0 = time.perf_counter()
            np.asarray(rn(jax.random.PRNGKey(s)))
            tn = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(r1(jax.random.PRNGKey(s)))
            t1 = time.perf_counter() - t0
            best = min(best, (tn - t1) / (args.iters - 1))
        print(json.dumps({"stage": name, "ms": round(best * 1000.0, 2)}),
              flush=True)

    def jitter(img, k):
        # keep the input data-dependent so XLA can't hoist the trunk
        return img + 0 * k[0].astype(img.dtype)

    # correctness first: the s2d stem must reproduce conv1 exactly
    x = imagenet_preprocess(imgs[3])
    ref = conv2d(x, params32["conv1"]["weight"], stride=2, padding=3)
    got = s2d_stem(x, params32["conv1"]["weight"])
    err = float(jnp.max(jnp.abs(ref - got)))
    print(json.dumps({"stage": "s2d_stem_max_abs_err", "value": err}),
          flush=True)
    assert err < 1e-4, err

    for tag, p in (("fp32", params32), ("bf16", params16)):
        # 1. full trunk per scale
        for i, img in enumerate(imgs):
            h, w = shapes[i]
            timed(f"{tag} scale{i} {h}x{w} trunk", lambda k, im=img: resnet50_layer3(
                p, imagenet_preprocess(jitter(im, k)))[0])
        # whole pyramid (all 7 scales, one program)
        timed(f"{tag} pyramid(7) trunk", lambda k: sum(
            jnp.sum(resnet50_layer3(p, imagenet_preprocess(jitter(im, k)))[0])
            for im in imgs))
        # 2. cumulative depth prefixes at the top scale
        top = imgs[0]
        timed(f"{tag} top stem", lambda k: stem(
            p, imagenet_preprocess(jitter(top, k))))
        for d in (1, 2, 3):
            timed(f"{tag} top stem+l1..l{d}", lambda k, dd=d: upto(
                p, imagenet_preprocess(jitter(top, k)), dd))
        # 3. space-to-depth stem A/B
        timed(f"{tag} top stem_s2d", lambda k: stem(
            p, imagenet_preprocess(jitter(top, k)), s2d=True))
        timed(f"{tag} top full_s2d", lambda k: upto(
            p, imagenet_preprocess(jitter(top, k)), 3, s2d=True))
        timed(f"{tag} pyramid(7) trunk_s2d", lambda k: sum(
            jnp.sum(upto(p, imagenet_preprocess(jitter(im, k)), 3, s2d=True))
            for im in imgs))
        # 5b. int8 timing ceiling (once, after the fp32 pass): conv weights
        # cast to int8 (BN/bias stay fp32) select the MXU int8 path with
        # int32 accumulation; activations round-trip through a quantize
        # cast at every conv boundary — exactly the dataflow a per-tensor
        # PTQ scheme would produce, so this times the real upper bound.
        # TIMING-ONLY: no scales, so the features are garbage; a proper
        # quantized trunk is only worth building if this wins big.
        if tag == "fp32":
            def to_i8(path_leaf):
                w = path_leaf
                if hasattr(w, "ndim") and w.ndim == 4:
                    return (127.0 * w / (jnp.max(jnp.abs(w)) + 1e-8)
                            ).astype(jnp.int8)
                return w

            params_i8 = jax.tree.map(to_i8, params32)
            timed("int8 top trunk", lambda k: resnet50_layer3(
                params_i8, imagenet_preprocess(jitter(imgs[0], k)))[0])
            timed("int8 pyramid(7) trunk", lambda k: sum(
                jnp.sum(resnet50_layer3(
                    params_i8, imagenet_preprocess(jitter(im, k)))[0])
                for im in imgs))

        # 4. padded same-shape bucketing (timing-only; see module docstring)
        for buckets in ([[0], [1, 2], [3, 4], [5, 6]],
                        [[0], [1], [2, 3], [4, 5, 6]]):
            def bucketed(k, bks=buckets):
                tot = jnp.float32(0)
                for bk in bks:
                    bh = max(shapes[i][0] for i in bk)
                    bw = max(shapes[i][1] for i in bk)
                    x = jnp.stack([
                        jnp.pad(imagenet_preprocess(jitter(imgs[i], k))[0],
                                ((0, bh - shapes[i][0]),
                                 (0, bw - shapes[i][1]), (0, 0)))
                        for i in bk])
                    tot += jnp.sum(resnet50_layer3(p, x)[0])
                return tot

            name = "+".join(str(len(b)) for b in buckets)
            timed(f"{tag} pyramid(7) trunk_bucket[{name}]", bucketed)


if __name__ == "__main__":
    main()
