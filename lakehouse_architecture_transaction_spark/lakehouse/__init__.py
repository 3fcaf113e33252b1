from lakehouse_architecture_transaction_spark.lakehouse.table import LakeTable  # noqa: F401
