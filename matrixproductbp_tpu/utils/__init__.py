from .misc import mean_with_uncertainty, sample_categorical
from .profiling import sweep_flops_estimate, roofline_report

__all__ = ["mean_with_uncertainty", "sample_categorical",
           "sweep_flops_estimate", "roofline_report"]
