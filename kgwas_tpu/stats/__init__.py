from .ldsc import ldsc_regression_weights
from .calibration import (
    find_closest_x,
    storey_pi_estimator,
    storey_tibshirani_integrate,
    storey_ribshirani_integrate,
)
from .gwas_eval import plot_cluster_range
