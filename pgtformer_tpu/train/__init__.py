from pgtformer_tpu.train import losses, ema, schedule
