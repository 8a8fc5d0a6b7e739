from .strings import (  # noqa: F401
    ascii_scrub,
    chaser_key,
    clean_gene_names,
    cytoscape_safe_name,
    fragment_key,
    na_to_empty,
    natural_chr_key,
    normalize_dot,
)
from .text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
