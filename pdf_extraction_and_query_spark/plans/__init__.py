"""Pipeline assembly and checkpoint/resume plans."""
