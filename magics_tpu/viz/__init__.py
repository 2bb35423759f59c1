from magics_tpu.viz.render import render_frame, render_trajectories, record_frames

__all__ = ["render_frame", "render_trajectories", "record_frames"]
