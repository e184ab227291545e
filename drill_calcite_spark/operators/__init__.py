from drill_calcite_spark.operators.match_recognize import match_recognize
from drill_calcite_spark.operators.repeat_union import repeat_union
from drill_calcite_spark.operators.asof import asof_join
from drill_calcite_spark.operators.snapshot import snapshot

__all__ = ["match_recognize", "repeat_union", "asof_join", "snapshot"]
