from .visualizer import NetworkVisualizer, progress_callback

__all__ = ["NetworkVisualizer", "progress_callback"]
