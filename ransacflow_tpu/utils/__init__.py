from ransacflow_tpu.utils.image import (
    resize_min_size,
    resize_max_size,
    resize_round_stride,
    to_array,
    scale_list,
    STRIDE_NET,
)
from ransacflow_tpu.utils.monitor import (
    MetricsLogger,
    StageTimer,
    profile_trace,
)
