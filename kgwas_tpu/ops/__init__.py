from .segment import (
    edge_valid_mask,
    gather_rows,
    segment_sum,
    segment_max,
    segment_mean,
    segment_softmax,
    leaky_relu,
    coo_spmm,
)
