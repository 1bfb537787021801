from gfnet_tpu.eval.benchmark import HomographyBenchmark, auc, evaluate_pair
