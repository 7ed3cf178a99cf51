from seedvc_tpu.train.optim import make_optimizer, warmup_cosine  # noqa: F401
from seedvc_tpu.train.step import TrainState, make_sharded_train_step  # noqa: F401
