from .extract_pipeline import extraction_dataset, run_extraction, run_resumable_extraction  # noqa: F401
