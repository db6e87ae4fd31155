from ogc_tpu.metrics.seg import (
    accumulate_eval_results,
    accumulate_eval_results_ignmask,
    calculate_AP,
    calculate_PQ_F1,
    clustering_metrics,
    eval_segm,
)
from ogc_tpu.metrics.flow import eval_flow
