from .registry import table_from_parquet, TESTDATA_ROWIDS

__all__ = ["table_from_parquet", "TESTDATA_ROWIDS"]
