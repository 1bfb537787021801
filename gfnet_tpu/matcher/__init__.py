from gfnet_tpu.matcher.api import GFNetMatcher
