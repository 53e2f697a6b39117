from grafink_spark.llm import (  # noqa: F401
    classify,
    corpus,
    dedup,
    multimodal,
    pca,
    pii,
    search,
    signals,
    simsearch,
    text,
)
