"""Prediction artifact schema.

The reference encodes metadata in filenames ('flow_{idx}_{n}H.npy' split
across *_Coarse/*_Fine directories). Here each pair gets one
``pair_{id}.npz`` with named fields — stable schema, partial reruns and
parity diffing stay easy (SURVEY.md §7.6).
"""

import os

import numpy as np

FIELDS = ("coarse_h", "fine_flow_down8", "fine_match_down8", "bg_mask")


def save_pair(out_dir, pair_id, prediction, **extra):
    """Save a multi_homography_predict() result dict (+ extra arrays)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = {k: prediction[k] for k in FIELDS}
    payload.update(extra)
    np.savez_compressed(os.path.join(out_dir, f"pair_{pair_id}.npz"), **payload)


def load_pair(out_dir, pair_id):
    """Load a pair artifact; returns dict of arrays or None if missing."""
    path = os.path.join(out_dir, f"pair_{pair_id}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def check_complete(out_dir, pair_ids):
    """Missing-pair report (the reference's check_file.py equivalent,
    evaluation/evalYFCC/check_file.py:27-74)."""
    missing = [
        p for p in pair_ids
        if not os.path.exists(os.path.join(out_dir, f"pair_{p}.npz"))
    ]
    return missing
