"""Run state: partition checkpoints, lineage records, resumable sinks."""

from .checkpoint import PartitionCheckpointer, run_partitioned  # noqa: F401
