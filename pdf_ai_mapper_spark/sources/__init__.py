"""Input sources beyond parquet: the Common-Crawl-native WARC format."""
