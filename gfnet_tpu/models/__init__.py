from gfnet_tpu.models.vit import VisionTransformer, vit_large
from gfnet_tpu.models.crossview import CrossViewDecoder
from gfnet_tpu.models.fpn import FPNEncoder, FPNDecoder
from gfnet_tpu.models.refiner import ConvRefiner
from gfnet_tpu.models.gfnet import GFNet
