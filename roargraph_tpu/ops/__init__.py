from . import distance, prune, topk  # noqa: F401
