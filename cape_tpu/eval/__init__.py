from .pck import PCKEvaluator, compute_pck_bbox

__all__ = ["PCKEvaluator", "compute_pck_bbox"]
