"""Arrow-batched image kernels (R1-R9, SURVEY.md §2.8)."""
