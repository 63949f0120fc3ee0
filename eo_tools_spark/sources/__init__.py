"""Sources: synthetic generators, derived views over driver testdata,
and the snapshot/lineage table layer (Iceberg-style commit/resume)."""
