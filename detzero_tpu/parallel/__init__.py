from detzero_tpu.parallel.trainer import Trainer, eval_gather
