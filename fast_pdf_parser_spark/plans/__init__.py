"""Scale plumbing: partitioning/salting and checkpoint/resume lineage."""
