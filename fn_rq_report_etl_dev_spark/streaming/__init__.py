"""Structured Streaming micro-batch pipeline: the reference's scheduled
daily re-scan expressed as an incremental streaming job."""
