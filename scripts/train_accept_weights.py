"""Produce acceptance-realistic alignment weights for bench.py's
multi-homography measurement.

With untrained nets the matchability head sits near 0.5 everywhere, so the
multi-homography loop's matched-region accumulator never reaches 1.0 and
every synthetic pair exhausts all maxCoarse+1 slots (bench.py docstring).
Real released checkpoints are unfetchable here (PARITY_STATUS.md), so this
script trains the full-size alignment nets briefly on synthetic translated
pairs — the tests/test_learning.py recipe at full architecture — until the
matchability head SATURATES on well-aligned content, which is what drives
the reference's accept/exit dynamics
(evaluation/evalHpatch/evaluation.py:225-243). The result is saved to
scripts/assets/accept_weights.npz (fp16, ~11.5 MB) and loaded by
`bench.py bench_multihomo(accept_params=...)`.

Run on any backend (CPU works; ~10 min on the 1-core host):

    JAX_PLATFORMS=cpu python scripts/train_accept_weights.py

The output is committed, so this only needs re-running after an
architecture change.
"""

import os
import shutil
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ransacflow")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 64          # training crop (nets are fully convolutional)
PAD = 16
N_GROUPS = 32
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets",
                   "accept_weights.npz")


def _write_dataset(root, rng):
    from PIL import Image
    from scipy.ndimage import gaussian_filter

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    for g in range(N_GROUPS):
        c = rng.rand(SIZE + 2 * PAD, SIZE + 2 * PAD, 3)
        c = gaussian_filter(c, sigma=(3, 3, 0))
        c -= c.min()
        c /= max(c.max(), 1e-6)
        ty, tx = int(rng.randint(-5, 6)), int(rng.randint(-5, 6))
        i1 = c[PAD:PAD + SIZE, PAD:PAD + SIZE]
        i2 = c[PAD - ty:PAD - ty + SIZE, PAD - tx:PAD - tx + SIZE]
        for v, arr in ((1, i1), (2, i2)):
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(root, f"{g}_{v}.jpg"), quality=95)


def main():
    import jax
    import jax.numpy as jnp

    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.train.loop import fit
    from ransacflow_tpu.models import save_params_npz
    from ransacflow_tpu.models.feature_extractor import feature_extractor
    from ransacflow_tpu.models.layers import l2_normalize
    from ransacflow_tpu.models.heads import net_matchability
    from ransacflow_tpu.ops.correlation import correlation_volume

    tmp = "/tmp/accept_weights_data"
    rng = np.random.RandomState(42)
    _write_dataset(tmp, rng)

    params = init_alignment_params(jax.random.PRNGKey(0))
    # stage 1: learn flow on translated pairs
    params, _ = fit(
        params, tmp, "/tmp/accept_weights_s1", mode="flow", mu_cycle=0.0,
        epochs=20, batch_size=4, img_size=SIZE, margin=10, lr=5e-4,
        seed=0, log_every=10**9,
    )
    # stage 3: flow+match with the reference's lambda_match=0.01 — at this
    # scale it saturates matchability toward 1 on consistent content in
    # <100 steps (tests/test_learning.py module docstring), which is the
    # behavior the accept test needs
    params, _ = fit(
        params, tmp, "/tmp/accept_weights_s3", mode="flow+match",
        mu_cycle=1.0, lambda_match=0.01, epochs=15, batch_size=4,
        img_size=SIZE, margin=10, lr=2e-4, seed=1, log_every=10**9,
    )

    # Temperature sharpening: the multi-homography exit path needs the
    # accumulated Mask to FILL, and the reference's update
    # `Mask = ((Mask + match) >= 1.0)`
    # (evaluation/evalHpatch/evaluation.py:237) only marks pixels whose
    # sigmoid matchability is exactly 1.0 in fp32 — i.e. final-layer
    # logits >~ 17, which long-trained released weights reach but a
    # 300-step run cannot (the -log(m) gradient vanishes as m -> 1).
    # conv4 has no bias, so scaling its weight scales the logits exactly:
    # the decision boundary (logit 0 <-> m = 0.5) is unchanged, confident
    # pixels saturate to 1.0, unconfident ones to 0.0 — the calibration
    # long training produces, applied to briefly-trained discriminative
    # weights. k = 25 turns the weakest "confident" logits (~0.7) into
    # saturated ones (17.5).
    params["netMatch"]["conv4"]["weight"] = (
        params["netMatch"]["conv4"]["weight"] * 25.0
    )

    # diagnostic: matchability on a fresh aligned pair must saturate —
    # the Mask update needs pixels at EXACTLY 1.0, not just a high mean
    c = rng.rand(SIZE, SIZE, 3).astype(np.float32)
    x = jnp.asarray(c)[None]
    feats, _ = feature_extractor(params["netFeatCoarse"], x)
    feats = l2_normalize(feats, axis=-1)
    corr = correlation_volume(feats, feats, 7)
    m, _ = net_matchability(params["netMatch"], corr, up8=True)
    mean_match = float(jnp.mean(m))
    frac_saturated = float(jnp.mean((m >= 1.0).astype(jnp.float32)))
    print(f"mean matchability on an identically-aligned pair: "
          f"{mean_match:.3f}; fraction exactly 1.0: {frac_saturated:.3f}")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    save_params_npz(OUT, params)
    print(f"saved {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB)")
    if frac_saturated < 0.5:
        print("WARNING: matchability did not saturate; bench accept "
              "dynamics may still exhaust slots")


if __name__ == "__main__":
    main()
