from dit4sr_tpu.models.mmdit import MMDiT  # noqa: F401
