"""Host-side utilities: telemetry logs, stage profiling."""
