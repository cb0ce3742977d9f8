from viewfusion_tpu.ops.schedules import (  # noqa: F401
    DiffusionSchedule,
    extract,
    make_beta_schedule,
)
