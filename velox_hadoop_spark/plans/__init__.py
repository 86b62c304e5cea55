from velox_hadoop_spark.plans.registry import QuerySpec, register, queries, oracles, specs

__all__ = ["QuerySpec", "register", "queries", "oracles", "specs"]
