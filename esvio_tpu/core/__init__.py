from esvio_tpu.core import lie, camera, types  # noqa: F401
