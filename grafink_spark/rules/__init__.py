from grafink_spark.rules.base import ClassifierRule, EDGE_SCHEMA  # noqa: F401
from grafink_spark.rules.exp_parser import parse_similarity_exp  # noqa: F401
from grafink_spark.rules.similarity import SimilarityClassifier  # noqa: F401
from grafink_spark.rules.samevalue import SameValueClassifier  # noqa: F401
from grafink_spark.rules.twomode import TwoModeClassifier  # noqa: F401
