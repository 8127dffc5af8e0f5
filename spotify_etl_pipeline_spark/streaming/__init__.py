"""Structured Streaming surface (SURVEY.md §2.8, §7 Phase 4).

The reference's "streaming" is daily cron + S3-event-driven files
(T1/T2); here that becomes a Structured Streaming file source with
checkpointed exactly-once incremental processing (replacing the
to_processed/already_processed archive dance, S9), plus genuine
watermarked tumbling/sliding/session windows over the events stream (X8).
"""
