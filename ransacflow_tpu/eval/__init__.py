from ransacflow_tpu.eval.compose import (
    reconstruct_flows,
    merge_multi_h,
    remove_small_cc,
    fill_flow_nearest,
)
from ransacflow_tpu.eval.artifacts import save_pair, load_pair, check_complete
from ransacflow_tpu.eval.hpatches import (
    predict_hpatches,
    evaluate_hpatches,
    hpatches_gt_grid,
)
from ransacflow_tpu.eval.corr import predict_corr, evaluate_corr, PIXEL_GRID
from ransacflow_tpu.eval.yfcc import (
    predict_yfcc,
    pooled_yfcc_predict,
    evaluate_yfcc,
    pick_rotation,
    matches_from_flow,
    norm_kp,
    pose_error,
    estimate_pose,
)
from ransacflow_tpu.eval.kitti import (
    predict_kitti,
    pooled_kitti_predict,
    evaluate_kitti,
    read_kitti_flow,
)
from ransacflow_tpu.eval.aachen import (
    export_correspondences,
    write_match_file,
)
from ransacflow_tpu.eval.sky import (
    make_sky_bg_fn,
    make_sky_bg_fn_rotated,
    resize_mask,
)
