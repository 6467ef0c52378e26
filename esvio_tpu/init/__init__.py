from esvio_tpu.init import (  # noqa: F401
    alignment, ex_rotation, pnp, relative_pose, sfm)
