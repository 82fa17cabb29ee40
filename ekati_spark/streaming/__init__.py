"""Structured Streaming surface over the ``events`` table (SURVEY.md §2.3
streaming row): windows, watermarks, stateful dedup, stream-static joins,
and a custom stateful operator via applyInPandasWithState."""
