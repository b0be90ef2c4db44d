"""Host-side utilities: calibration/geometry, dataset IO, timing, messages."""
