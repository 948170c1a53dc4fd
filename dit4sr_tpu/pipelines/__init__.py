from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline  # noqa: F401
