from kgray.kernels.kgx_agg import (  # noqa: F401
    MinAny,
    PriorityCoalesceMax,
    SortedUniqueConcat,
    merge_edges_pandas,
    merge_nodes_pandas,
)
