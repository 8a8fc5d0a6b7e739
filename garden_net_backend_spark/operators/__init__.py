from .chas import (  # noqa: F401
    chas,
    feature_abundance,
    feature_mean_degree,
    randomize_edges_distance_matched,
)
from .graph import (  # noqa: F401
    bfs_distances,
    canonicalize_edges,
    connected_components,
    degrees,
    diameter,
    ego_graph,
    ego_nodes,
    graph_metadata,
    induced_subgraph,
    interchromosomal_count,
    neighbors,
    simplify,
    subset_edges_by_nodesets,
    symmetrize,
    transitivity,
    triangle_count,
)
from .interval import (  # noqa: F401
    interval_overlap_join,
    nearest_interval_join,
    overlap_aggregate,
    overlap_flag,
    range_query,
)
