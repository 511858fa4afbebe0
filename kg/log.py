"""Structured run logging (O21).

The reference wires a console+file logger and logs totals, shard bounds
and every query it sends (``Program.cs:34-40``, ``Migrator.cs:36,41-42``,
``Neo4j.cs:84``).  The Spark analogue: one structured JSON line per
pipeline event on the ``kg`` logger — machine-parseable next to the
lineage table's durable metrics rows.  ``jobs/run_pipeline.py -l/--log-
level`` mirrors the reference's ``-l`` flag (``CommandLineOptions.cs:24-26``).
"""

from __future__ import annotations

import json
import logging

logger = logging.getLogger("kg")


def log_event(event: str, **fields) -> None:
    """One structured line per pipeline event: kg INFO {"event": ...}."""
    logger.info(json.dumps({"event": event, **fields}, default=str))
