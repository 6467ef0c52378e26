"""esvio_tpu — TPU-native event-based stereo visual-inertial odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of arclab-hku/ESVIO
(reference: /root/reference): surface-of-active-events + time surfaces, Arc*-style
event corners, pyramidal LK association, IMU preintegration, sliding-window
tightly-coupled Gauss-Newton with Schur elimination + marginalization,
stereo-depth-aided initialization, loop closure with a 4-DoF pose graph, and
sharded multi-device bundle adjustment.

Everything on the compute path is pure-functional JAX with static shapes
(capacity + mask), jit/vmap/scan friendly, and shardable with jax.sharding.
"""

__version__ = "0.1.0"

from esvio_tpu import core, events, frontend, imu, solver, vio  # noqa: F401
