from grafink_spark.llm import dedup, simsearch, text  # noqa: F401
