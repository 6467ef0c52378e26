from esvio_tpu.utils import metrics  # noqa: F401
