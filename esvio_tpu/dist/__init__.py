from esvio_tpu.dist import sharding, distributed_ba  # noqa: F401
