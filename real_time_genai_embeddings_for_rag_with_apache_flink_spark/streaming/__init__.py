from .pipeline import build_source, run_pipeline  # noqa: F401
