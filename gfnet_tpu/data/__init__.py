from gfnet_tpu.data.homography_synth import random_homography_pair
from gfnet_tpu.data.dataset import HomographyDataset, BatchLoader
