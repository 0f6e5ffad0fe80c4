"""Structured Streaming seam over the ``events`` table.

The reference has zero streaming (SURVEY §2B streaming row: the app is
synchronous request/response). These operators are the driver-directed
extension, written batch-first: each windowed aggregation runs as a batch
query (oracle-testable) and the same plan wires into readStream/
writeStream (tests/test_streaming.py drives it with a memory sink).
"""
