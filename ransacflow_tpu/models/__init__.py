from ransacflow_tpu.models.layers import (
    l2_normalize,
    merge_bn_stats,
    cast_params,
)
from ransacflow_tpu.models.feature_extractor import (
    init_feature_extractor,
    feature_extractor,
)
from ransacflow_tpu.models.heads import (
    init_net_flow_coarse,
    init_net_matchability,
    net_flow_coarse,
    net_matchability,
    flow_gradient_magnitude,
    flow_to_grid,
    pred_flow_coarse,
    pred_flow_coarse_no_grad,
)
from ransacflow_tpu.models.resnet50 import (
    init_resnet50_layer3,
    resnet50_layer3,
    imagenet_preprocess,
)
from ransacflow_tpu.models.convert import (
    state_dict_to_tree,
    load_alignment_checkpoint,
    load_resnet50_trunk,
    load_torch_checkpoint,
    save_params_npz,
    load_params_npz,
)
from ransacflow_tpu.models.segnet import (
    init_segnet_encoder,
    init_segnet_decoder,
    segnet_encoder,
    segnet_decoder,
    SkySegmenter,
)
