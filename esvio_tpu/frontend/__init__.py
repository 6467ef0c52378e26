from esvio_tpu.frontend import pyramid, lk, ransac, mask  # noqa: F401
