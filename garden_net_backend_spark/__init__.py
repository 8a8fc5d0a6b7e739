"""garden_net_backend_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of VeraPancaldiLab/GARDEN-NET_backend.

Architecture: DataFrame/SQL-first (Catalyst plans everything), custom
kernels only where Spark lacks an operator (interval-overlap join,
nearest-range join, distance-matched edge randomization, MinHash-LSH
dedup). See SURVEY.md for the operator inventory this covers.
"""

__version__ = "0.1.0"
