from dit4sr_tpu.schedulers.flow_match import (  # noqa: F401
    FlowMatchSchedule,
    make_schedule,
    train_sigmas,
)
