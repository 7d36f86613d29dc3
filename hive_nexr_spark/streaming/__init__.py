"""Structured Streaming operators over the `events` table.

The reference is batch-only (README.txt:29-33); these are the north-star
streaming extensions: windowed aggregation with watermarks, and
sessionization (batch gaps-and-islands + streaming session_window).
"""
