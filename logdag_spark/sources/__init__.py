from logdag_spark.sources.series import read_series_csv, read_series_parquet  # noqa: F401
