"""ransacflow_tpu — a TPU-native (JAX/XLA/Pallas) two-stage image alignment framework.

Re-implements the full capability surface of RANSAC-Flow (ECCV 2020,
"RANSAC-Flow: generic two-stage image alignment") as a from-scratch,
TPU-first framework:

- coarse stage: multi-scale deep features, dense mutual-NN matching (one MXU
  matmul), and fully vectorized on-device RANSAC homography fitting
  (all hypotheses solved in one batched DLT, no host round trips);
- fine stage: anti-aliased feature CNN, local correlation volume, flow +
  matchability heads, bilinear warp composition;
- multi-homography iteration, self-supervised training (SSIM + cycle +
  matchability + flow-gradient losses), and the four evaluation harnesses
  (HPatches / KITTI / YFCC / MegaDepth-RobotCar sparse correspondences).

Everything in `ops/` and `models/` is pure and jittable; device parallelism
lives in `parallel/` (jax.sharding Mesh + shard_map, XLA collectives over ICI).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor an explicitly-set JAX_PLATFORMS env var even on hosts whose
    # site initialization pre-sets jax_platforms programmatically (the dev
    # harness pins "axon,cpu", which silently overrides the env var and
    # sent every JAX_PLATFORMS=cpu subprocess through the slow device
    # tunnel — a CLI smoke test spent 325 of 375 s on two constant
    # readbacks before this guard).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        # Backends already initialized — the earlier caller's choice stands.
        # Anything else (e.g. a typo'd platform string) must NOT be swallowed:
        # the process would silently run on the wrong backend.
        import warnings as _warnings

        _warnings.warn(
            "JAX backends already initialized; JAX_PLATFORMS="
            f"{_os.environ['JAX_PLATFORMS']!r} was not applied",
            RuntimeWarning,
            stacklevel=2,
        )
