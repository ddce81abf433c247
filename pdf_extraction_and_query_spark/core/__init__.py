"""Pure-Python reference-semantics kernels.

These functions reproduce, byte-for-byte, the text semantics of the reference
pipeline (extract -> clean -> chunk). They are deliberately dependency-free so
they can run (a) eagerly in the oracle used by the span-sequence-equality
tests and (b) inside grouped-map Arrow UDFs on executors.
"""
