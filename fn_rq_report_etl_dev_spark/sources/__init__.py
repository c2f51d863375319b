"""Ingestion surface: HTTP JSON batch source with retry/backoff, fixed-column
projection, and schema'd file readers."""
