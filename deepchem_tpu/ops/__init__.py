from deepchem_tpu.ops.segment import (
    segment_sum, segment_max, segment_max_sumgrad, segment_mean,
    segment_softmax, segment_softmax_sorted, gather_neighbors_sum,
    gather_neighbors_max,
    graph_pool, node_degrees)

__all__ = [
    'segment_sum', 'segment_max', 'segment_max_sumgrad', 'segment_mean',
    'segment_softmax', 'segment_softmax_sorted',
    'gather_neighbors_sum', 'gather_neighbors_max',
    'graph_pool', 'node_degrees',
]
