from grafink_spark.llm import corpus, dedup, multimodal, simsearch, text  # noqa: F401
