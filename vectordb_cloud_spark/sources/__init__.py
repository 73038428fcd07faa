from vectordb_cloud_spark.sources.bucketed import colocated_join, write_bucketed_table
from vectordb_cloud_spark.sources.readers import (
    read_csv_corpus,
    read_excel_fixture,
    read_insert_requests,
    read_jsonl_corpus,
    read_xlsx,
    scroll,
)

__all__ = [
    "colocated_join",
    "read_csv_corpus",
    "read_excel_fixture",
    "read_insert_requests",
    "read_jsonl_corpus",
    "read_xlsx",
    "scroll",
    "write_bucketed_table",
]
