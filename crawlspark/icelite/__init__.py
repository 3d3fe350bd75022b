from crawlspark.icelite.table import (
    IceliteCatalog,
    SchemaEvolutionError,
    Snapshot,
    check_schema_evolution,
    scan_parquet_stats,
)

__all__ = [
    "IceliteCatalog",
    "SchemaEvolutionError",
    "Snapshot",
    "check_schema_evolution",
    "scan_parquet_stats",
]
