from .ncurve import fused_history_reads, diffusion_single_pass

__all__ = ["fused_history_reads", "diffusion_single_pass"]
