"""End-to-end corpus pipelines composed from the operator modules."""
