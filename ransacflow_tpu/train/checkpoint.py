"""Orbax checkpointing of alignment params (+ optimizer state).

The reference saves a flat dict of 4 torch state_dicts
(train/train.py:293-306); here params are already torch-key-mirroring
pytrees, so an orbax save round-trips them directly, and
`models.convert.load_alignment_checkpoint` ingests the reference's
released .pth files into the same structure.
"""

import os

import orbax.checkpoint as ocp


def save_checkpoint(path, params, opt_state=None, step=None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if step is not None:
        payload["step"] = step
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path, like=None):
    """Restore a checkpoint saved by `save_checkpoint`.

    Args:
      like: optional matching pytree of arrays/ShapeDtypeStructs for typed
        restoration; None restores as saved.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)
