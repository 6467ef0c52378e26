from esvio_tpu.init import alignment, pnp  # noqa: F401
