"""movex_cdc_ray — Ray-Data-native CDC / incremental-ingest engine."""

__version__ = "5.0.0"  # round-numbered build version (release_info verb)
