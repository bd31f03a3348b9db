from capelinker_spark.functions import normalize, strdist  # noqa: F401
