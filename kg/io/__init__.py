from kg.io.tables import ensure_sink, sink_ddl, sink_ddl_statements  # noqa: F401
