from crawlspark.icelite.table import IceliteCatalog, Snapshot, scan_parquet_stats

__all__ = ["IceliteCatalog", "Snapshot", "scan_parquet_stats"]
