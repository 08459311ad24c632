"""Structured Streaming surface.

The reference is pure batch (SURVEY.md §2.9); its incremental behaviors —
stage resume via ``--skip-preprocessing`` (`run_extraction.py:253-260`)
and the append-only curation delta (`app.py:302-346`) — map here to
checkpointed ``Trigger.AvailableNow`` incremental extraction over a
growing transcript directory. Watermarks/session windows are not part of
reference parity and are intentionally absent.
"""
