from viewfusion_tpu.training.schedulers import LrScheduler, lr_schedule  # noqa: F401
from viewfusion_tpu.training.checkpoint import Checkpoint  # noqa: F401
