from kgray.kernels.kgx_agg import (  # noqa: F401
    PriorityCoalesceMax,
    SortedUniqueConcat,
    merge_edges_pandas,
    merge_nodes_pandas,
)
