"""Sink-side defaults shared by every parquet writer in the package.

Measured on the 48M-turn corpus at 32 CPUs (BASELINE.md): parquet
dictionary encoding on the high-cardinality text/message columns costs
~40% of sink wall time for no size win (56.9 s snappy+dict vs 34-41 s
without), and zstd-1 matches snappy's encode speed once dictionaries
are off while writing 40% smaller files (3.1 vs 5.2 GB) — at 100 TB
that is the difference shipped over the network and stored. So:
dictionary OFF, zstd level 1.
"""

PARQUET_WRITE_OPTS = {
    "use_dictionary": False,
    "compression": "zstd",
    "compression_level": 1,
}
