"""Source connectors (SURVEY.md §2.1): REST JSON ingest, schema-pinned
file readers, and the JDBC mirror."""
