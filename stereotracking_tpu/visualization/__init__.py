from .visualizer import TrackVisualizer, draw_mot_errors  # noqa: F401
