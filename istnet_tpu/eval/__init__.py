from istnet_tpu.eval.nocs_map import compute_independent_map, evaluate, headline_metrics

__all__ = ["compute_independent_map", "evaluate", "headline_metrics"]
