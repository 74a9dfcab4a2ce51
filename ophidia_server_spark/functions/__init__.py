from ophidia_server_spark.functions import primitives  # noqa: F401
