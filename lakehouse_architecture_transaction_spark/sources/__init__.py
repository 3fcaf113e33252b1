from lakehouse_architecture_transaction_spark.sources.csv import read_csv_enforced  # noqa: F401
from lakehouse_architecture_transaction_spark.sources.append import append_datasets  # noqa: F401
from lakehouse_architecture_transaction_spark.sources.excel import excel_to_csv_all_sheets  # noqa: F401
