"""Sources & sinks: parquet/text/csv/json readers, provenance-tagged
multi-path scans, and partitioned/bucketed writers."""
