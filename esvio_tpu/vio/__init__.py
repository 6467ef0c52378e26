from esvio_tpu.vio import feature_manager  # noqa: F401
