from grafink_spark.sources.partitions import PartitionManager  # noqa: F401
from grafink_spark.sources.reader import Reader  # noqa: F401
from grafink_spark.sources.fixed_vertices import (  # noqa: F401
    FixedVertex,
    read_fixed_vertices,
)
