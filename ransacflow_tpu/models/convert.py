"""torch checkpoint -> JAX parameter-tree conversion.

Because model param trees mirror torch state_dict naming (layers.py), the
conversion is purely mechanical: split keys on '.', transpose conv kernels
OIHW -> HWIO, drop non-parameter buffers. Ingests the reference's released
checkpoints (a flat dict of 4 state_dicts, train/train.py:293-306), the
MoCo ResNet-50 checkpoint, and torchvision resnet50 state_dicts.
"""

import numpy as np
import jax.numpy as jnp

_SKIP_SUFFIXES = ("num_batches_tracked", "filt")


def state_dict_to_tree(state_dict, skip_prefixes=(), dtype=jnp.float32):
    """Convert a torch state_dict (name -> tensor/ndarray) to a param tree.

    Args:
      state_dict: mapping of dotted names to tensors (torch or numpy).
      skip_prefixes: key prefixes to drop (e.g. ('layer4.', 'fc.') when
        truncating a ResNet-50 at layer3).
    """
    tree = {}
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if any(key.startswith(p) for p in skip_prefixes):
            continue
        if key.endswith(_SKIP_SUFFIXES):
            continue
        # np.array (copy) — torch .numpy() shares memory with the live
        # module, and JAX CPU zero-copies numpy inputs; without the copy,
        # later in-place torch mutations (e.g. BN running-stat updates)
        # would silently leak into the converted tree.
        arr = np.array(getattr(val, "numpy", lambda: val)())
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:  # linear (O, I) -> (I, O)
            arr = arr.T
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr, dtype)
    return tree


RESNET_TRUNK_SKIP = ("layer4.", "fc.", "avgpool.", "l2norm.")


def load_torch_checkpoint(path):
    """torch.load a .pth on CPU (requires the baked-in torch)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_alignment_checkpoint(path, dtype=jnp.float32):
    """Load a released RANSAC-Flow checkpoint: dict with keys
    netFeatCoarse / netCorr / netFlowCoarse / netMatch (each a state_dict).

    netCorr has no parameters (the correlation op is parameter-free) but is
    present in the checkpoints as an empty state_dict.
    """
    ckpt = load_torch_checkpoint(path)
    out = {}
    for key in ("netFeatCoarse", "netFlowCoarse", "netMatch"):
        if key in ckpt:
            out[key] = state_dict_to_tree(ckpt[key], dtype=dtype)
    return out


def load_resnet50_trunk(path_or_state_dict, moco=False, dtype=jnp.float32):
    """Load coarse-feature ResNet-50 weights truncated at layer3.

    Args:
      path_or_state_dict: .pth path or an in-memory state_dict.
      moco: the MoCo checkpoint nests the state_dict under 'model' and
        prefixes keys with 'module.' (quick_start/coarseAlignFeatMatch.py:40-45).
    """
    sd = path_or_state_dict
    if isinstance(sd, str):
        sd = load_torch_checkpoint(sd)
    if moco and "model" in sd:
        sd = sd["model"]
    return state_dict_to_tree(sd, skip_prefixes=RESNET_TRUNK_SKIP, dtype=dtype)


def save_params_npz(path, params, dtype=np.float16):
    """Save a nested dict param tree as one flat .npz ('a/b/c' keys).

    Storage format for small checked-in weight files (e.g. the
    accept-realistic bench weights, scripts/train_accept_weights.py);
    fp16 storage halves the file and is lossless enough for benchmark
    acceptance dynamics. Use orbax (train/checkpoint.py) for real
    training checkpoints.
    """
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(prefix + (str(k),), v)
        else:
            flat["/".join(prefix)] = np.asarray(node, dtype)

    walk((), params)
    np.savez_compressed(path, **flat)


def load_params_npz(path, dtype=jnp.float32):
    """Inverse of `save_params_npz`: rebuild the nested dict tree."""
    tree = {}
    with np.load(path) as f:
        for key in f.files:
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(f[key], dtype)
    return tree
