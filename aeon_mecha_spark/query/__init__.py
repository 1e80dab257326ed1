from aeon_mecha_spark.query.relation import Relation, U  # noqa: F401
