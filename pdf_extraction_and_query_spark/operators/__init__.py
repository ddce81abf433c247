"""Spark DataFrame operators (extraction stages + training-data ops)."""
