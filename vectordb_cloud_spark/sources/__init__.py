from vectordb_cloud_spark.sources.readers import (
    read_csv_corpus,
    read_excel_fixture,
    read_insert_requests,
    read_jsonl_corpus,
    scroll,
)

__all__ = [
    "read_csv_corpus",
    "read_excel_fixture",
    "read_insert_requests",
    "read_jsonl_corpus",
    "scroll",
]
