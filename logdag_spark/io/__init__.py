from logdag_spark.io.catalog import Catalog  # noqa: F401
