from ransacflow_tpu.pipeline.coarse import CoarseAligner
from ransacflow_tpu.pipeline.fine import pred_flow_mask, fine_features
from ransacflow_tpu.pipeline.multihomo import (
    multi_homography_predict,
    multi_homography_predict_fused,
)
from ransacflow_tpu.pipeline.api import RansacFlowAligner, init_alignment_params
from ransacflow_tpu.pipeline.refine import refine_flow_ransac
