"""``python -m vectordb_cloud_spark`` — see cli.py."""

from vectordb_cloud_spark.cli import main

if __name__ == "__main__":
    main()
