from tomojax.align.cc import (
    phase_cross_correlation, cor_flipping, cross_correlation_chain,
    com_align,
    moment_match,
    align_to_reprojection,
    cross_correlation_filtered, fourier_shift,
)
from tomojax.align.refine import (
    PARAM_SETS, refine_view, refine_views, gradient_descent_view,
    alignment_cost, alignment_cost_grad,
)
from tomojax.align.pipeline import align_reconstruct, frozen_polish, \
    AlignState

__all__ = [
    "phase_cross_correlation", "cor_flipping", "cross_correlation_chain",
    "com_align",
    "moment_match",
    "align_to_reprojection",
    "cross_correlation_filtered", "fourier_shift", "PARAM_SETS",
    "refine_view", "refine_views", "gradient_descent_view",
    "alignment_cost", "alignment_cost_grad", "align_reconstruct",
    "frozen_polish",
    "AlignState",
]
