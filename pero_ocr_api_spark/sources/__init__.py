"""Custom Python data sources (Spark 4 `pyspark.sql.datasource` API)."""

from .upload_source import UploadDataSource, register_upload_source

__all__ = ["UploadDataSource", "register_upload_source"]
