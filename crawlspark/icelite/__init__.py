from crawlspark.icelite.table import IceliteCatalog, Snapshot

__all__ = ["IceliteCatalog", "Snapshot"]
