from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline, bicubic_upscale  # noqa: F401
