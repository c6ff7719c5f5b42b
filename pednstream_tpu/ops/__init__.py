from .ncurve import (boundary_and_diffusion_reads, diffusion_single_pass,
                     fused_history_reads)

__all__ = [
    "boundary_and_diffusion_reads",
    "diffusion_single_pass",
    "fused_history_reads",
]
