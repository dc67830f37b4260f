"""Utilities: profiling, roofline accounting, timers."""
