"""Structured Streaming extension of the batch pipeline.

The reference is strictly batch (SURVEY.md §2.9); its resumable
checkpointed export + 3-day-lookback incremental merge map naturally to
readStream + checkpointLocation + foreachBatch merge. These are
extensions, not parity requirements.
"""
