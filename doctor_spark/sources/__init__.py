"""Source connectors: ingest Common-Crawl-style data into the pages table."""
