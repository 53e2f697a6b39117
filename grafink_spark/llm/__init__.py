from grafink_spark.llm import (  # noqa: F401
    corpus,
    dedup,
    multimodal,
    pii,
    search,
    signals,
    simsearch,
    text,
)
