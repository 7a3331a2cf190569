"""Streaming: sources (S1-S3), sinks (K1-K8), windows/watermarks, pipeline."""
