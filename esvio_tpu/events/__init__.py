from esvio_tpu.events import sae, corners  # noqa: F401
