"""TPU-native point-cloud ops — the equivalents of the reference CUDA kernels.

Reference kernel families (see SURVEY.md §2 native inventory, all cited into
/root/reference/scene_graph_prediction/pointnet2_dir/pointnet2_ops_lib/):

  furthest_point_sample   sampling_gpu.cu:69-229
  gather_operation        sampling_gpu.cu:8-57
  ball_query              ball_query_gpu.cu:9-44
  grouping_operation      group_points_gpu.cu
  three_nn                interpolate_gpu.cu:9-68
  three_interpolate       interpolate_gpu.cu:72-154

Here they are pure-XLA / Pallas implementations with the same observable
semantics (FPS start-at-0 + `mag<=1e-3` skip; ball-query first-hit padding),
plus segment ops for graph message passing and a Floyd–Warshall for the
Graphormer preprocessing (replacing Cython algos.pyx).
"""

from or4d_tpu.ops.fps import furthest_point_sample, gather_points
from or4d_tpu.ops.ball_query import ball_query
from or4d_tpu.ops.grouping import grouping_operation, query_and_group, group_all
from or4d_tpu.ops.interpolate import three_nn, three_interpolate
from or4d_tpu.ops.scatter import segment_sum, segment_max, segment_mean
from or4d_tpu.ops.floyd_warshall import floyd_warshall, gen_edge_input

__all__ = [
    "furthest_point_sample",
    "gather_points",
    "ball_query",
    "grouping_operation",
    "query_and_group",
    "group_all",
    "three_nn",
    "three_interpolate",
    "segment_sum",
    "segment_max",
    "segment_mean",
    "floyd_warshall",
    "gen_edge_input",
]
