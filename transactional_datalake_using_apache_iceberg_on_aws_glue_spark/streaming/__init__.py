"""Structured Streaming surface (reference S2/T1/T2)."""

from .cdc_stream import start_cdc_stream, run_stream_once

__all__ = ["start_cdc_stream", "run_stream_once"]
