"""crawlspark — a PySpark-native crawl-frontier + fetch-scheduler engine.

Brand-new engine with the capabilities of warrenregister/spacetime-crawler4py
(reference read-only at /root/reference), re-expressed Spark-first:

- the URL frontier / seen-set is a partitioned columnar table (icelite
  snapshots, Iceberg-semantics over Parquet) instead of a ``shelve`` file
  (ref: crawler/frontier.py:222);
- per-domain politeness + FIFO ordering is a window-ranked micro-batch
  quota instead of a lock-guarded ``defaultdict(Queue)``
  (ref: crawler/frontier.py:42,95-110);
- parse / fingerprint / image-payload work runs in Arrow-vectorized
  pandas UDFs, everything else stays in Catalyst-optimized DataFrame ops.

See SURVEY.md for the full operator mapping.
"""

__version__ = "0.1.0"
