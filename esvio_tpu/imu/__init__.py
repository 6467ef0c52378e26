from esvio_tpu.imu import preintegration  # noqa: F401
