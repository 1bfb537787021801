from gfnet_tpu.ops.resize import interpolate, resize_weight_matrix
from gfnet_tpu.ops.sampler import grid_sample
from gfnet_tpu.ops.correlation import global_correlation, softmax_pos_embed, corr_volume_flow
from gfnet_tpu.ops.local_correlation import local_correlation
from gfnet_tpu.ops.kde import kde
from gfnet_tpu.ops.attention import scaled_dot_product_attention
