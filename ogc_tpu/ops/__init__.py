from ogc_tpu.ops.core import (
    ball_query,
    furthest_point_sample,
    gather,
    group,
    group_all,
    interpolate_weights,
    knn,
    query_and_group,
    square_distance,
    three_interpolate,
    three_nn,
    upsample_feat,
)

__all__ = [
    "ball_query",
    "furthest_point_sample",
    "gather",
    "group",
    "group_all",
    "interpolate_weights",
    "knn",
    "query_and_group",
    "square_distance",
    "three_interpolate",
    "three_nn",
    "upsample_feat",
]
