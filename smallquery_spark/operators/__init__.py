from smallquery_spark.operators.asof import asof_join
from smallquery_spark.operators.rangejoin import banded_time_join
from smallquery_spark.operators.topk import top_k, top_k_per_group

__all__ = ["asof_join", "banded_time_join", "top_k", "top_k_per_group"]
