from .pipeline import build_graph  # noqa: F401
