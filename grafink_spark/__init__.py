"""grafink_spark — a PySpark-native property-graph ETL + analytics engine.

Re-implements the capabilities of astrolabsoftware/grafink (a Scala/Spark
batch job that classifies astronomy alerts into a similarity graph and
bulk-loads JanusGraph) as an idiomatic PySpark library:

- partitioned-parquet reader with column pruning / nested flatten / SQL
  derived columns (reference: core Reader.scala)
- consecutive vertex-id assignment with reserved id space
  (reference: IDManagerSparkService.scala, SparkExtensions.zipWithIndex)
- edge classifier rules: similarity expression DSL, same-value cliques,
  two-mode recipe edges (reference: processor/edgerules/*)
- a parquet-backed property-graph store + JSON schema catalog + traversal
  query helpers (replacing JanusGraph/HBase/Gremlin)
- beyond-reference LLM-data-pipeline operators: dedup (exact/minhash-LSH/
  simhash/ngram-jaccard/embedding), similarity search, text analysis,
  multimodal binary-column plumbing, and structured-streaming ingestion.

Everything is DataFrame/Catalyst-first and designed for 100 TB scale:
predicate/partition pushdown, broadcast of small dims, equi-join
decomposition of theta joins, no driver-side loops over data.
"""

__version__ = "0.1.0"

from grafink_spark.session import get_spark  # noqa: F401
