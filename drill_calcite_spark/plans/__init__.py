from drill_calcite_spark.plans.builder import Rel

__all__ = ["Rel"]
