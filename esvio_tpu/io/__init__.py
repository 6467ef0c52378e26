from esvio_tpu.io import config, trajectory, datasets  # noqa: F401
