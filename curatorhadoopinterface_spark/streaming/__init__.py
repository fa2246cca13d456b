"""Structured Streaming surface (SURVEY.md section 2C streaming rows).

The reference's streaming story is a batch poll: JobHandler re-runs over a
directory when new documents land (JobHandler.java:149-194); memoization by
content hash (CuratorHandler.java:468-527) is its stateful-dedup analogue.
This package makes that loop continuous with Structured Streaming.
"""
