"""Transactional table storage: an optimistic-concurrency commit log
over plain parquet (the ACID MERGE layer D4/D5 otherwise lack without
Delta/Iceberg — see storage/txnlog.py)."""
