from sidemantic_spark.preagg.manager import PreAggManager
from sidemantic_spark.preagg.matcher import PreAggregation, match_preagg

__all__ = ["PreAggManager", "PreAggregation", "match_preagg"]
