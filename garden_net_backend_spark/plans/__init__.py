from .network_build import (  # noqa: F401
    annotate_nodes,
    build_network,
    cytoscape_elements,
    network_metadata,
    suggestions,
)
from .search import search_subnetwork  # noqa: F401
