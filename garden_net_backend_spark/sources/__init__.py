from .readers import (  # noqa: F401
    load_hic,
    load_interactions,
    load_pchic,
    read_alias_db,
    read_bait_names,
    read_feature,
    read_intronic_regions,
    sniff_format,
)
from .testdata import load_tables, register_views  # noqa: F401
