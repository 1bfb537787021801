from gfnet_tpu.train.loss import RobustLoss, gt_warp_from_homography
from gfnet_tpu.train.state import TrainState, create_train_state, make_lr_schedule
from gfnet_tpu.train.step import make_train_step
