"""Run state: partition checkpoints, lineage records, resumable sinks."""

from .checkpoint import (PartitionCheckpointer, checkpointed,  # noqa: F401
                         run_partitioned)
