from ransacflow_tpu.train.losses import compute_losses, margin_mask, TRAIN_MODULES
from ransacflow_tpu.train.trainer import (
    make_train_step,
    make_data_parallel_step,
    make_optimizer,
    split_trainable,
    local_index_roll,
)
from ransacflow_tpu.train.data import PairFolder, train_transform, prefetch
from ransacflow_tpu.train.validation import validate, PIXEL_GRID
from ransacflow_tpu.train.checkpoint import save_checkpoint, load_checkpoint
