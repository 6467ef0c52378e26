from esvio_tpu.loop import fast, brief, pose_graph, keyframe_db, loop_closure  # noqa: F401
