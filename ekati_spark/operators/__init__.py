"""Custom operators Spark lacks natively, composed from DataFrame ops or
Pandas-UDF kernels (SURVEY.md §2.3 + the LLM-data-pipeline surface)."""
